package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.SignatureAggs

/** Streaming twins of the document-dedup surface (Dedup d01/d02): documents
  * as an arriving stream, fingerprinted and signature-stamped *at ingest*.
  *
  * The key design point: a MinHash signature is a fold over one document's
  * own shingles, so on a stream it is a **stateless per-row map** — no
  * aggregation state, Append mode, unbounded throughput. Only the
  * *decisions* need state:
  *  - exact dedup keeps a seen-fingerprint set, bounded by the watermark
  *    horizon (`dropDuplicatesWithinWatermark`);
  *  - near-dup detection joins the arriving band buckets against a static
  *    (periodically rebuilt) index of the existing corpus — a stream-static
  *    broadcast join, the "dedup against yesterday's corpus" production
  *    shape. Candidates stream out; exact verification happens downstream
  *    in batch (same as d02's verify stage).
  */
object DocStreams {

  /** Per-document MinHash signature computed in one pass over the text —
    * scalar Scala mirror of the batch pipeline (shingleSets →
    * md5Hash60 → minhash_sig aggregate). Must stay bit-identical to the
    * expression path; DocStreamsSpec asserts equality against
    * [[graft.operators.Dedup.minhashSignatures]]. */
  def signature(text: String, n: Int = 3): Option[Array[Long]] = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    if (toks.length < n) None
    else {
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      toks.sliding(n).foreach(w => seen += w.mkString(" "))
      val sig = Array.fill(SignatureAggs.Lanes)(Long.MaxValue)
      val md = java.security.MessageDigest.getInstance("MD5")
      seen.foreach { s =>
        val hex = md.digest(s.getBytes("UTF-8")).take(8)
          .map(b => f"${b & 0xff}%02x").mkString.take(15)
        val h = java.lang.Long.parseLong(hex, 16) % SignatureAggs.MersennePrime
        var i = 0
        while (i < SignatureAggs.Lanes) {
          val x = (SignatureAggs.permA(i) * h + SignatureAggs.permB(i)) % SignatureAggs.MersennePrime
          if (x < sig(i)) sig(i) = x
          i += 1
        }
        md.reset()
      }
      Some(sig)
    }
  }

  /** Documents as a file stream (single-file table staged into a directory,
    * as EventStreams.readEventStream does for events). */
  def readDocumentStream(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get(s"$sfDir/documents.parquet")
    val dir =
      if (Files.isDirectory(src)) src
      else {
        val d = Files.createTempDirectory("graft-docs-stream")
        Files.copy(src, d.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
        d
      }
    val schema = spark.read.parquet(src.toString).schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
  }

  /** Ingest stamping: arrival time, exact fingerprint, MinHash signature —
    * all stateless per-row work (Append-mode safe, no shuffle). */
  def fingerprinted(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val sigUdf = udf((text: String) => signature(text))
    docs
      .withColumn("arrival_ts", current_timestamp())
      .withColumn("fp", md5(graft.functions.TextFns.normText(col("text"))))
      .withColumn("sig", sigUdf(col("text")))
  }

  /** Exact-dedup the stream: first arrival per fingerprint within the
    * watermark horizon survives. State is O(rate × horizon), evicted by the
    * watermark — the property that keeps 100 TB/day feasible. */
  def dedupedStream(fingerprinted: DataFrame, horizon: String = "1 hour"): DataFrame =
    fingerprinted
      .withWatermark("arrival_ts", horizon)
      .dropDuplicatesWithinWatermark("fp")

  /** Per-document repetition metrics (the t15 boilerplate gate) as a
    * scalar — a doc's bigram fractions depend only on its own tokens, so
    * on a stream this is stateless per-row work, exactly like
    * [[signature]]. Must stay value-identical to the batch
    * [[graft.operators.TextOps.repetitionMetrics]] aggregation (same
    * integer counts, same IEEE double quotients); DocStreamsSpec asserts
    * it. Returns None for docs with < 2 tokens (no bigrams — the batch
    * pipeline drops them too). */
  def repetitionMetrics(text: String): Option[(Long, Double, Double)] = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    if (toks.length < 2) None
    else {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      var i = 0
      while (i < toks.length - 1) {
        val bg = toks(i) + " " + toks(i + 1)
        counts.update(bg, counts.getOrElse(bg, 0L) + 1L)
        i += 1
      }
      val n = toks.length.toLong - 1L
      val top = counts.valuesIterator.max
      val dup = counts.valuesIterator.filter(_ >= 2L).sum
      Some((n, top.toDouble / n.toDouble, dup.toDouble / n.toDouble))
    }
  }

  /** Quality-gate the stream at ingest: stamp every arriving doc with its
    * repetition metrics and keep verdict (thresholds = the batch t15
    * gate). Stateless per-row map — Append mode, no shuffle, no state; the
    * same hygiene decision the batch pipeline makes lands before the doc
    * is ever persisted. Docs without bigrams pass (nothing to measure). */
  def qualityGated(spark: SparkSession, docs: DataFrame,
      topFracMax: Double = 0.08, dupFracMax: Double = 0.2): DataFrame = {
    import spark.implicits._
    val metricsUdf = udf((text: String) => repetitionMetrics(text))
    docs
      .withColumn("rep", metricsUdf(col("text")))
      .withColumn("n_bigrams", col("rep._1"))
      .withColumn("top_bigram_frac", col("rep._2"))
      .withColumn("dup_bigram_frac", col("rep._3"))
      .withColumn("keep",
        col("rep").isNull ||
          (col("top_bigram_frac") <= topFracMax && col("dup_bigram_frac") <= dupFracMax))
      .drop("rep")
  }

  /** Static hashed-shingle index of the eval/benchmark split (the d09
    * decontamination reference set): `(sh_h, eval_doc)`. Benchmark-sized →
    * broadcasts. */
  def evalShingleIndex(docs: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      n: Int = 5): DataFrame =
    graft.operators.Dedup.hashedShingles(
      graft.operators.Dedup.shingleSets(docs.filter(col("doc_id") % 19 === 0).toDF(), n))
      .withColumnRenamed("doc_id", "eval_doc")

  /** Decontamination at ingest (streaming twin of d09): each arriving
    * doc's word-n-gram hashes probe the broadcast eval index; contaminated
    * (arriving, eval) pairs stream out in Append mode. The shingle explode
    * is a stateless per-row expression chain (no UDF: `transform` +
    * `slice` + the same md5-60 hash as batch); the only state is the pair
    * dedup, watermark-bounded. The input must carry a watermarked
    * `arrival_ts` (see [[dedupedStream]]). */
  def contaminationProbe(stream: DataFrame, evalIndex: DataFrame, n: Int = 5): DataFrame = {
    val toks = graft.functions.TextFns.tokens(col("text"))
    stream
      .filter(col("doc_id") % 19 =!= 0) // the eval split is not "arriving"
      .withColumn("toks", toks)
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), col("arrival_ts"),
        explode(transform(
          sequence(lit(1), size(col("toks")) - (n - 1)),
          i => concat_ws(" ", slice(col("toks"), i, lit(n))))).as("shingle"))
      .select(col("doc_id"), col("arrival_ts"),
        graft.operators.Dedup.md5Hash60(col("shingle")).as("sh_h"))
      .join(broadcast(evalIndex), Seq("sh_h"))
      .dropDuplicatesWithinWatermark("doc_id", "eval_doc")
      .select(col("doc_id").as("arriving_id"), col("eval_doc"))
  }

  /** Static LSH band index of an existing corpus: (band, bucket, doc_id),
    * built from the batch signature pipeline. Rebuilt periodically (per
    * micro-batch Spark re-reads static sides); small enough to broadcast —
    * it is 16 longs per corpus doc. */
  def bandIndex(sigs: DataFrame): DataFrame = {
    val bucketArr = array((0 until graft.operators.Dedup.Bands).map(b =>
      xxhash64(slice(col("sig"), b * graft.operators.Dedup.RowsPerBand + 1,
        graft.operators.Dedup.RowsPerBand), lit(b))): _*)
    sigs.select(col("doc_id"), posexplode(bucketArr).as(Seq("band", "bucket")))
  }

  /** Near-dup candidates at ingest: each arriving doc's band buckets probe
    * the static corpus index. Emits (arriving doc, existing doc) candidate
    * pairs in Append mode — stream-side stateless except the pair dedup,
    * whose state is bounded by the stream's watermark (a doc colliding in
    * several bands must not emit the pair once per band). The input stream
    * must carry a watermarked `arrival_ts` (see [[dedupedStream]]). */
  def nearDupCandidates(spark: SparkSession, stream: DataFrame, corpusIndex: DataFrame): DataFrame = {
    val bucketArr = array((0 until graft.operators.Dedup.Bands).map(b =>
      xxhash64(slice(col("sig"), b * graft.operators.Dedup.RowsPerBand + 1,
        graft.operators.Dedup.RowsPerBand), lit(b))): _*)
    val streamBands = stream
      .filter(col("sig").isNotNull)
      .select(col("doc_id"), col("arrival_ts"), posexplode(bucketArr).as(Seq("band", "bucket")))
    streamBands
      .join(broadcast(corpusIndex.withColumnRenamed("doc_id", "corpus_doc_id")),
        Seq("band", "bucket"))
      .filter(col("doc_id") =!= col("corpus_doc_id"))
      .select(col("doc_id").as("arriving_id"), col("corpus_doc_id").as("existing_id"),
        col("arrival_ts"))
      .dropDuplicatesWithinWatermark("arriving_id", "existing_id")
      .select("arriving_id", "existing_id")
  }

  /** Static token-leg side of [[releaseGate]]: the eval split's hashed
    * shingle multiset collapsed to (sh_h → n_eval) counts. d09's
    * `n_shared_ngrams` for a corpus doc is the count of (its distinct
    * shingle, eval row) hash matches — exactly what summing lookups of
    * the doc's distinct shingle hashes in this map reproduces.
    * Benchmark-sized → collected and broadcast by the gate. */
  def evalShingleCounts(evalDocs: DataFrame, n: Int = 5): DataFrame =
    graft.operators.Dedup.hashedShingles(
        graft.operators.Dedup.shingleSets(evalDocs, n))
      .groupBy("sh_h").agg(count(lit(1)).as("n_eval"))

  /** Composed at-ingest release gate — the streaming twin of the p03
    * release audit, closing the at-ingest loop: ONE Append-mode pass
    * stamps every arriving document with all three contamination
    * verdicts and the releasable bit, value-identical to the batch audit
    * row (spec-asserted ≡ [[graft.operators.Pipeline.releaseAudit]]):
    *
    *  - token leg (d09): the doc's distinct word-n-gram hashes — the
    *    same LinkedHashSet + md5-60 scalar mirror [[signature]] uses —
    *    summed against the broadcast [[evalShingleCounts]] map. Per-row,
    *    no join, no state.
    *  - semantic leg (d17): broadcast LEFT join against the static
    *    flagged-evidence table (contamination-sized — d17's output, not
    *    the embeddings corpus), the same assembly shape the batch audit
    *    uses; flag bit from match PRESENCE, 0.0 display sentinel via
    *    coalesce.
    *  - blocklist leg (t19): the batch regexp, per-row.
    *
    * Everything is stateless per-row work plus one broadcast left join,
    * so the gate needs no watermark and holds at any ingest rate — the
    * decision a release pipeline wants BEFORE a contaminated document is
    * ever persisted. */
  /** Scalar token-leg kernel of [[releaseGate]]: the doc's DISTINCT
    * n-gram md5-60 hashes summed against the eval shingle-count map —
    * the per-row mirror of d09's (distinct corpus shingle × eval row)
    * join count. Tokenization, distinctness, and the 60-bit hash must
    * stay identical to `Dedup.shingleSets`/`md5Hash60`; PropertySpec
    * pins the equality against the batch pipeline on generated corpora. */
  def sharedNgramCount(text: String, n: Int, evalCounts: Map[Long, Long]): Long = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    if (toks.length < n) 0L
    else {
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      toks.sliding(n).foreach(w => seen += w.mkString(" "))
      val md = java.security.MessageDigest.getInstance("MD5")
      var sum = 0L
      seen.foreach { s =>
        val hex = md.digest(s.getBytes("UTF-8")).take(8)
          .map(b => f"${b & 0xff}%02x").mkString.take(15)
        sum += evalCounts.getOrElse(java.lang.Long.parseLong(hex, 16), 0L)
        md.reset()
      }
      sum
    }
  }

  def releaseGate(spark: SparkSession, stream: DataFrame,
      evalCounts: DataFrame, semEvidence: DataFrame,
      ngramN: Int = 5,
      terms: Seq[String] = Seq("customer", "supplier", "order")): DataFrame = {
    import spark.implicits._
    val evalMap = evalCounts.as[(Long, Long)].collect().toMap // benchmark-sized
    val bcEval = spark.sparkContext.broadcast(evalMap)
    val tokUdf = udf((text: String) => sharedNgramCount(text, ngramN, bcEval.value))
    val pat = terms.mkString("\\b(", "|", ")\\b")
    stream
      .withColumn("token_ngrams", tokUdf(col("text")))
      .join(broadcast(semEvidence.select(col("vec_id").as("doc_id"),
        col("max_cos"))), Seq("doc_id"), "left")
      .withColumn("n_hits", regexp_count(col("text"), lit(pat)).cast("long"))
      .withColumn("flags",
        when(col("token_ngrams") > 0L, 1L).otherwise(0L) +
          when(col("max_cos").isNotNull, 2L).otherwise(0L) +
          when(col("n_hits") > 0L, 4L).otherwise(0L))
      .select(col("doc_id"), col("token_ngrams"),
        coalesce(col("max_cos"), lit(0.0)).as("sem_cos"),
        col("n_hits"), col("flags"), (col("flags") === 0L).as("releasable"))
  }

  /** Per-row kernel of [[templateGate]]: the doc's distinct 3-shingle
    * count and how many of those shingles sit in the (broadcast) hot
    * vocabulary — the scalar mirror of t34's join+rollup. Tokenization,
    * distinctness, and the 60-bit hash must stay identical to
    * `Dedup.shingleSets`/`md5Hash60` (same contract as
    * [[sharedNgramCount]]). */
  def shingleProfile(text: String, hot: scala.collection.Set[Long]): Array[Long] = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    if (toks.length < 3) Array(0L, 0L)
    else {
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      toks.sliding(3).foreach(w => seen += w.mkString(" "))
      val md = java.security.MessageDigest.getInstance("MD5")
      var nHot = 0L
      seen.foreach { s =>
        val hex = md.digest(s.getBytes("UTF-8")).take(8)
          .map(b => f"${b & 0xff}%02x").mkString.take(15)
        if (hot.contains(java.lang.Long.parseLong(hex, 16))) nHot += 1L
        md.reset()
      }
      Array(seen.size.toLong, nHot)
    }
  }

  /** At-ingest language-mismatch gate — t35's streaming twin: every
    * arriving document gets its declared-vs-detected verdict the moment
    * it lands (per-doc rows; batch t35 is the AGGREGATED confusion
    * matrix over exactly these verdicts, and the spec asserts both
    * levels). Unlike t24/t34's broadcast-model gates this one needs no
    * model at all — the stopword lists are literals — and unlike the
    * probe twins it shares the batch code path itself:
    * [[graft.operators.TextOps.withLangScores]] is pure column math, so
    * the same codegen'd expressions run under the micro-batch planner.
    * Zero streaming state, no watermark, Append-safe at any ingest rate.
    */
  def langGate(stream: DataFrame): DataFrame =
    graft.operators.TextOps.withLangScores(
        stream.select(col("doc_id"), col("source"), col("lang"),
          graft.functions.TextFns.tokens(col("text")).as("toks")))
      .select(col("doc_id"), col("source"), col("lang"), col("pred_lang"),
        (col("lang") =!= col("pred_lang")).as("mismatch"))

  /** At-ingest templated-ness scoring — t34's streaming twin: every
    * arriving document is scored against a FROZEN hot-shingle vocabulary
    * (d23's report keys, broadcast once at query start) the moment it
    * lands, instead of waiting for a batch re-profile. The contract
    * (spec-asserted): scored against the SAME vocabulary, the streamed
    * rows are value-identical to batch t34 restricted to the arrivals —
    * the vocabulary is the model here, and like t24/t27's models it is
    * corpus-learned offline and applied at ingest. Zero streaming state
    * (pure per-row work against the broadcast set), so the gate holds at
    * any ingest rate with no watermark; docs with < 3 tokens have no
    * shingles and are dropped, matching t34's domain. */
  def templateGate(spark: SparkSession, stream: DataFrame,
      hotShingles: DataFrame, flagAt: Double): DataFrame = {
    import spark.implicits._
    val hotSet = hotShingles.select("sh_h").as[Long].collect().toSet // hot-vocabulary-sized
    val bc = spark.sparkContext.broadcast(hotSet)
    val profUdf = udf((text: String) => shingleProfile(text, bc.value))
    stream
      .withColumn("p", profUdf(col("text")))
      .withColumn("n_shingles", element_at(col("p"), 1))
      .filter(col("n_shingles") > 0L)
      .withColumn("n_hot", element_at(col("p"), 2))
      .withColumn("boiler_frac",
        round(col("n_hot").cast("double") / col("n_shingles").cast("double"), 6))
      .select(col("doc_id"), col("n_shingles"), col("n_hot"),
        col("boiler_frac"), (col("boiler_frac") >= flagAt).as("is_templated"))
  }

  /** Per-row kernel of [[templateScrubGate]]: tokenize, mark every token
    * covered by a hot 3-shingle occurrence, digest the survivors — the
    * scalar mirror of batch d26's join+anti-join+reassembly. Tokenization
    * and the 60-bit hash must stay identical to `Dedup.templateScrub`
    * (same contract as [[shingleProfile]]). */
  def scrubProfile(text: String, hot: scala.collection.Set[Long]): (Long, Long, String) = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(str: String): Long = {
      val hex = md.digest(str.getBytes("UTF-8")).take(8)
        .map(b => f"${b & 0xff}%02x").mkString.take(15)
      md.reset(); java.lang.Long.parseLong(hex, 16)
    }
    val covered = new Array[Boolean](toks.length)
    var i = 0
    while (i + 3 <= toks.length) {
      if (hot.contains(h60(toks.slice(i, i + 3).mkString(" ")))) {
        covered(i) = true; covered(i + 1) = true; covered(i + 2) = true
      }
      i += 1
    }
    val kept = toks.indices.filterNot(covered).map(toks)
    val keptMd5 = md.digest(kept.mkString(" ").getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    (toks.length.toLong, covered.count(identity).toLong, keptMd5)
  }

  /** At-ingest template SCRUB — d26's streaming twin, and the editing
    * counterpart of [[templateGate]] (which only scores): every arriving
    * document is cut against a FROZEN hot-shingle vocabulary (d23's
    * report keys, broadcast once) the moment it lands, emitting the same
    * per-doc edit record batch d26 produces (counts, scrub fraction,
    * cleaned-text digest). The contract (spec-asserted): against the
    * SAME vocabulary, streamed rows are value-identical to batch d26
    * restricted to the arrivals. Zero streaming state — pure per-row
    * work against the broadcast set — so the scrub holds at any ingest
    * rate; zero-token docs have no edit record, matching d26's domain. */
  def templateScrubGate(spark: SparkSession, stream: DataFrame,
      hotShingles: DataFrame): DataFrame = {
    import spark.implicits._
    val hotSet = hotShingles.select("sh_h").as[Long].collect().toSet // hot-vocabulary-sized
    val bc = spark.sparkContext.broadcast(hotSet)
    val profUdf = udf((text: String) => scrubProfile(text, bc.value))
    stream
      .withColumn("p", profUdf(col("text")))
      .withColumn("n_tokens", col("p._1"))
      .filter(col("n_tokens") > 0L)
      .select(col("doc_id"), col("n_tokens"), col("p._2").as("n_scrubbed"),
        round(col("p._2").cast("double") / col("n_tokens").cast("double"), 6)
          .as("scrub_frac"),
        col("p._3").as("kept_md5"))
  }

  /** Deterministic hash-bucket sampling at ingest — the streaming twin of
    * batch q23/q24: the keep decision is md5-bucket arithmetic over the
    * row's OWN key ([[graft.operators.Sampling.hashBucket]]), so it is
    * stateless, shuffle-free, and reproducible — replaying the stream,
    * reordering micro-batches, or running the batch query over the same
    * rows selects the IDENTICAL document set (the property distributed
    * sampling must have; spec-asserted ≡ batch). `rate` is a per-row
    * percent expression: `lit(10)` for q23's uniform 10%, q24's
    * per-stratum `when(col("lang") === "en", 25).otherwise(80)` for
    * class rebalancing — either way the plan stays one map-only filter. */
  def sampledStream(docs: DataFrame,
      rate: org.apache.spark.sql.Column): DataFrame =
    docs
      .withColumn("bucket", graft.operators.Sampling.hashBucket(col("doc_id")))
      .filter(col("bucket") < rate)

  /** PII stamp at ingest — the streaming twin of batch t30: every arriving
    * doc carries its per-category match counts, redacted digest, and
    * `has_pii` bit before it is ever persisted. The stamp IS the batch
    * kernel ([[graft.operators.TextOps.piiStamp]] — pure codegen'd column
    * expressions, no UDF), so stream and batch cannot drift; stateless
    * per-row, Append-mode, no shuffle, no state (spec-asserted ≡ batch).
    * Redaction-at-ingest is the PII posture a training-data pipeline
    * actually wants: raw text never lands in the lake. */
  def piiStamped(docs: DataFrame): DataFrame =
    graft.operators.TextOps.piiStamp(docs)
}

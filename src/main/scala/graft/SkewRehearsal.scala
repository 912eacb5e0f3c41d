package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skewed-corpus rehearsal (dev main, feeds SCALE.md): every prior
  * rehearsal corpus is uniform-ish — copies replicate the base corpus's
  * healthy structure. 100 TB of web data is not healthy: it is
  * Zipf-skewed by source (one crawl feed can dominate) and
  * duplicate-heavy (mirrors re-serve whole sites). This main builds two
  * adversarial k× corpora and measures the queries whose plans those
  * corpora attack:
  *
  *  1. SKEWED corpus: ~90% of documents in ONE source, and every base
  *     document tripled verbatim (exact-dup clusters of size 3 across
  *     copy boundaries — "duplicates cluster"). Attacks the
  *     source-keyed aggregations (t22/q31), the fingerprint shuffle
  *     (d01), and the shingle joins under dup flooding (d02/d04/d18).
  *     Evidence: each query's k× wall ratio on the skewed corpus vs its
  *     ratio on the uniform corpus of the SAME k — a plan survives skew
  *     iff ratio_skew / ratio_uniform stays ~2 or under.
  *  2. BOILERPLATE corpus: the uniform k× corpus with one fixed
  *     12-token boilerplate sentence appended to EVERY document — the
  *     exact shape that detonates an uncapped shared-shingle candidate
  *     join (its shingles' df = corpus size, candidate fan-out df²).
  *     The capped d04/d18 must ride their normal band; the pruned-work
  *     accounting (Σ df·(df−1)/2 over all vs sub-cap shingles, computed
  *     from the df table, never executed) shows the k² term the cap
  *     removed — at 10× that term is ~10¹¹ pair rows, which is why the
  *     uncapped variant is accounted, not run.
  *
  * Also times q31's source-keyed join shape both plain and through
  * [[graft.operators.SkewJoin.saltedJoin]] with the broadcast path
  * disabled (merge-join hints) — the explicit-salt mitigation exercised
  * on a corpus where one key holds 90% of the rows.
  *
  * Round 11 extends the boilerplate wave to EVERY other shingle-join
  * consumer: d20/d21/d22/d23/t34 are RUN on the boiler corpus (d21
  * through its new capped kernel; the others are structurally bounded —
  * d20 by #sources², d22 by LSH banding, d23/t34 aggregates), d09/d19
  * get their val×eval fan-out ACCOUNTED from the df table (the %19
  * query-form eval slice is corpus-proportional, so executing the
  * uncapped join is the same detonator the cap removed from d04 — the
  * accounting shows the term; the production contract is a BOUNDED eval
  * set, which is also run, with boilerplate appended to the eval side).
  *
  * `runMain graft.SkewRehearsal [sfDir] [outDir] [k] [sections] [reuse]`
  *  - sections: csv of {skew, boiler, salt, boiler2}; default all.
  *  - "reuse": skip corpus writes when outDir already holds them.
  */
object SkewRehearsal {

  /** k× corpus, 90%-one-source and exact-dup-clustered: copies 1 and 2
    * keep base text VERBATIM (every base doc → a 3-clone cluster);
    * copies 3+ are token-tagged (shingle-disjoint) as in
    * [[ScaleRehearsal.scaledDocs]]; 9 of 10 docs land in `hot_src`. */
  def skewedDocs(docs: DataFrame, k: Int): DataFrame =
    // Verbatim first 3 copies: dup clusters of size min(k, 3).
    ScaleRehearsal.taggedCopies(docs, k, verbatim = 3)
      .withColumn("source",
        when(col("doc_id") % 10 < 9, lit("hot_src")).otherwise(col("source")))

  /** The uniform k× corpus with a fixed boilerplate sentence appended to
    * every document — df of its shingles = corpus size. */
  def boilerplateDocs(docs: DataFrame, k: Int): DataFrame = {
    val boiler = "all rights reserved contact us terms of service apply to this site"
    ScaleRehearsal.scaledDocs(docs, k)
      .withColumn("text", concat(col("text"), lit(" " + boiler)))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "target/skew10x"
    val k = if (args.length > 2) args(2).toInt else 10
    val sections: Set[String] =
      if (args.length > 3 && args(3) != "all") args(3).split(",").toSet
      else Set("skew", "boiler", "salt", "boiler2", "bandcap", "curves",
        "vecskew", "dupheavy")
    val reuse = args.length > 4 && args(4) == "reuse"
    val spark = GraftSession.get("graft-skew-rehearsal")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    if (!reuse) {
      ScaleRehearsal.scaledDocs(docs, k).write.mode("overwrite")
        .parquet(s"$outDir/uniform/documents.parquet")
      skewedDocs(docs, k).write.mode("overwrite")
        .parquet(s"$outDir/skewed/documents.parquet")
      boilerplateDocs(docs, k).write.mode("overwrite")
        .parquet(s"$outDir/boiler/documents.parquet")
      val skewShare = spark.read.parquet(s"$outDir/skewed/documents.parquet")
        .groupBy("source").count().orderBy(desc("count")).head()
      println(s"[skew] corpora written; hottest source = ${skewShare.getString(0)} " +
        s"with ${skewShare.getLong(1)} docs of ${docs.count() * k}")
    }

    def minOf2(f: => Long): (Double, Long) = {
      def once(): (Double, Long) = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (tA, rows) = once(); val (tB, _) = once()
      (math.min(tA, tB), rows)
    }

    if (sections("skew")) {
    val names = Seq("d01_dedup_exact", "d02_dedup_minhash_lsh",
      "d04_ngram_jaccard", "d18_containment_pairs",
      "t22_source_profile", "q31_temperature_mix",
      // Round 11: p12's admission prefix is range-partitioned by
      // (source, -score, doc_id), so a 90%-one-source corpus is its
      // adversarial direction — the design claim is that the hot source
      // spreads across range partitions instead of pinning one window
      // partition's sort.
      "p12_budget_fill")
    println(f"[skew] ${"query"}%-24s ${"1x"}%7s ${"unif" + k + "x"}%8s ${"skew" + k + "x"}%8s ${"r_unif"}%7s ${"r_skew"}%7s  skew/unif")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val (t1, _) = minOf2(fn(spark, sfDir).count())
      val (tU, rU) = minOf2(fn(spark, s"$outDir/uniform").count())
      val (tS, rS) = minOf2(fn(spark, s"$outDir/skewed").count())
      println(f"[skew] $name%-24s $t1%7.2f $tU%8.2f $tS%8.2f ${tU / t1}%6.1fx ${tS / t1}%6.1fx ${tS / tU}%6.2f (rows u=$rU s=$rS)")
    }
    }

    if (sections("boiler")) {
    // ---- boilerplate wave: capped d04/d18 wall + pruned-work accounting
    Seq("d04_ngram_jaccard", "d18_containment_pairs").foreach { name =>
      val fn = SparkEntry.queries(name)
      val (t1, _) = minOf2(fn(spark, sfDir).count())
      val (tB, rB) = minOf2(fn(spark, s"$outDir/boiler").count())
      println(f"[skew] ${name + "_boiler"}%-24s $t1%7.2f ${tB}%8.2f ${tB / t1}%6.1fx (rows $rB)")
    }
    val hsB = operators.Dedup.materializedShingleHashes(
      spark.read.parquet(s"$outDir/boiler/documents.parquet"))
    val acct = hsB.groupBy("sh_h").agg(count(lit(1)).as("df"))
      .agg(
        sum(expr("df * (df - 1) / 2")).as("pairs_uncapped"),
        sum(when(col("df") <= operators.Dedup.ShingleDfCap,
          expr("df * (df - 1) / 2")).otherwise(lit(0))).as("pairs_capped"))
      .head()
    println(f"[skew] boiler candidate-join work: uncapped=${acct.getDouble(0)}%.3e " +
      f"pair-rows vs capped=${acct.getDouble(1)}%.3e " +
      f"(cap pruned ${100.0 * (1 - acct.getDouble(1) / acct.getDouble(0))}%.2f%%)")
    }

    if (sections("boiler2")) boilerWave2(spark, sfDir, outDir)

    if (sections("vecskew")) vecSkewWave(spark, sfDir, outDir, k, reuse)

    if (sections("bandcap")) bandCapWave(spark, sfDir, outDir, reuse)

    if (sections("dupheavy")) dupHeavyWave(spark, sfDir, outDir, k, reuse)

    if (sections("curves")) curveWave(spark, sfDir, outDir, reuse)

    if (sections("salt")) {
    // ---- q35's per-key top-k window: single-window vs the two-phase
    // salted plan on the 90%-hot source (the regime where one key's sort
    // outgrows a partition; correctness equivalence is spec-asserted in
    // SamplingSpec, this is the wall-clock evidence)
    Seq(("uniform", s"$outDir/uniform"), ("skewed", s"$outDir/skewed")).foreach {
      case (tag, dir) =>
        val capDocs = spark.read.parquet(s"$dir/documents.parquet")
        val (tW, nW) = minOf2(operators.Sampling.sourceCap
          .fn(spark, dir).count())
        val (t2, n2) = minOf2(
          operators.Sampling.sourceCapTwoPhase(capDocs, 10).count())
        require(nW == n2, s"two-phase cardinality drift on $tag: $nW vs $n2")
        println(f"[skew] q35-cap/$tag%-16s window=$tW%.2fs two-phase=$t2%.2fs on $nW rows")
    }

    // ---- explicit salting on the 90%-hot source key (broadcast disabled:
    // merge hints force the shuffle-join regime salting exists for)
    val skewed = spark.read.parquet(s"$outDir/skewed/documents.parquet")
      .select(col("doc_id"), col("source")).localCheckpoint()
    val perSource = skewed.groupBy("source").count().localCheckpoint()
    val (tPlain, nPlain) = minOf2(
      skewed.hint("merge").join(perSource.hint("merge"), "source").count())
    val (tSalted, nSalted) = minOf2(
      operators.SkewJoin.saltedJoin(
        skewed.hint("merge"), perSource.hint("merge"), "source", 32).count())
    require(nPlain == nSalted, s"salted join changed cardinality: $nPlain vs $nSalted")
    println(f"[skew] source-join plain=$tPlain%.2fs salted(32)=$tSalted%.2fs on ${nPlain} rows")
    }
    spark.stop()
  }

  /** Round-13 band-bucket wave: the LSH analogue of the hot shingle. A
    * "hotdup" corpus = the uniform 10× corpus plus H ≫ [[operators.Dedup
    * .BandBucketCap]] byte-identical copies of one base doc — every copy
    * minhashes to the SAME bucket in ALL bands, so uncapped candidate
    * generation materializes H²/2 pair rows per band (and d02's verified
    * OUTPUT itself would be quadratic: the copies genuinely are dups —
    * which is exactly why candidate generation, not verification, must
    * carry the bound; byte-copies are the exact-fingerprint gate's
    * catch). Accounting (from the bucket-size table, never executed)
    * shows the H² term the cap removes; walls show capped d02 and d32's
    * bipartite probe staying in-band on the corpus that detonates the
    * uncapped plan. */
  /** The uniform 10× corpus plus H = 2048 byte-copies of one base doc
    * (every copy minhashes to the same bucket in all bands) — written
    * once, shared by the bandcap and curves waves. */
  private def ensureHotdup(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, outDir: String, reuse: Boolean): String = {
    val hot = s"$outDir/hotdup"
    val H = 2048L
    if (!reuse ||
        !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$hot/documents.parquet"))) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val base = docs.orderBy("doc_id").limit(1)
        .select("text", "lang", "source").head()
      val stride = (docs.agg(max("doc_id")).head().getLong(0) + 1L) * 16L
      val clones = spark.range(H).select(
        (col("id") + lit(stride)).as("doc_id"),
        lit(base.getString(0)).as("text"),
        lit(base.getString(1)).as("lang"),
        lit(base.getString(2)).as("source"),
        lit(base.getString(0).length.toLong).as("n_chars"))
      ScaleRehearsal.scaledDocs(docs, 10).unionAll(clones)
        .write.mode("overwrite").parquet(s"$hot/documents.parquet")
    }
    hot
  }

  /** Round-14 wave: the OPERATING-CURVE queries on the adversarial
    * corpora they characterize. d33/d35 run on the boiler corpus (every
    * boiler n-gram's df = corpus size ≫ 256, so ALL curve points must
    * hold flat — the df-cap family protects the whole curve, not just
    * the shipped point; the between-64-and-256 detonation shape is
    * pinned at spec scale in DedupCapSpec, where the planted df sits
    * inside the curve's range); d34 runs on the hotdup corpus (the
    * H-clone bucket is over cap in every band, so candidates stay
    * bounded at every prefix while uncapped generation would carry
    * Bands·H²/2 pair rows). Walls vs the 1× uniform baseline plus the
    * full curve signatures — the SHAPE is the evidence. */
  private def curveWave(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, outDir: String, reuse: Boolean): Unit = {
    def minOf2(f: => Long): (Double, Long) = {
      def once(): (Double, Long) = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (tA, rows) = once(); val (tB, _) = once()
      (math.min(tA, tB), rows)
    }
    val hot = ensureHotdup(spark, sfDir, outDir, reuse)
    Seq(("d33_cap_operating_curve", s"$outDir/boiler"),
        ("d35_contam_ngram_curve", s"$outDir/boiler"),
        ("d34_band_operating_curve", hot)).foreach { case (name, dir) =>
      val fn = SparkEntry.queries(name)
      val (t1, _) = minOf2(fn(spark, sfDir).count())
      val (tS, _) = minOf2(fn(spark, dir).count())
      val tag = if (dir == hot) "hotdup" else "boiler"
      println(f"[skew] ${name + "_" + tag}%-34s base=$t1%7.2f skew=$tS%8.2f ${tS / t1}%6.1fx")
      fn(spark, dir).collect().foreach(r => println(s"[skew]   ${name}_$tag row: $r"))
      fn(spark, sfDir).collect().foreach(r => println(s"[skew]   ${name}_base row: $r"))
    }
  }

  private def bandCapWave(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, outDir: String, reuse: Boolean): Unit = {
    def minOf2(f: => Long): (Double, Long) = {
      def once(): (Double, Long) = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (tA, rows) = once(); val (tB, _) = once()
      (math.min(tA, tB), rows)
    }
    val hot = ensureHotdup(spark, sfDir, outDir, reuse)
    // Accounting: per-(band, bucket) population → candidate pair rows,
    // uncapped vs sub-cap. The hot cluster contributes Bands · H·(H−1)/2
    // to the uncapped term; the capped term must not carry it.
    val banded = operators.Dedup.bandBuckets(
      operators.Dedup.signaturesFromHashes(
        operators.Dedup.materializedShingleHashes(
          spark.read.parquet(s"$hot/documents.parquet"))))
    val acct = banded.groupBy("band", "bucket").agg(count(lit(1)).as("bn"))
      .agg(
        sum(expr("bn * (bn - 1) div 2")).as("pairs_uncapped"),
        sum(when(col("bn") <= operators.Dedup.BandBucketCap,
          expr("bn * (bn - 1) div 2")).otherwise(lit(0L))).as("pairs_capped"),
        max("bn").as("max_bucket"))
      .head()
    println(f"[skew] hotdup band-candidate work: uncapped=${acct.getLong(0).toDouble}%.3e " +
      f"pair-rows vs capped=${acct.getLong(1).toDouble}%.3e " +
      f"(max bucket ${acct.getLong(2)}; cap pruned " +
      f"${100.0 * (1 - acct.getLong(1).toDouble / acct.getLong(0))}%.2f%%)")
    // Walls: the shipped (capped) d02 self-join and d32 bipartite probe on
    // the corpus that detonates the uncapped plans. Ratio baseline = 1×.
    Seq("d02_dedup_minhash_lsh", "d32_incremental_neardup").foreach { name =>
      val fn = SparkEntry.queries(name)
      val (t1, _) = minOf2(fn(spark, sfDir).count())
      val (tB, rB) = minOf2(fn(spark, hot).count())
      println(f"[skew] ${name + "_hotdup"}%-30s $t1%7.2f ${tB}%8.2f ${tB / t1}%6.1fx (rows $rB)")
    }
  }

  /** 50%-exact-duplicate corpus: k copies where the first ceil(k/2)+1
    * keep the text VERBATIM (dup groups of that size) and the rest carry
    * tagged tokens (unique). At k=10 that is 6 verbatim copies → 5 of
    * every 6 group members drop → exact-drop fraction = 50% of the
    * corpus — the realistic raw-web-crawl shape (30–50% exact dups) that
    * falsified round-15's "drop sets ≪ corpus" broadcast premise. */
  def dupHeavyDocs(docs: DataFrame, k: Int): DataFrame =
    ScaleRehearsal.taggedCopies(docs, k, verbatim = k / 2 + 1)

  /** Round-16 wave: the keep-verdict legs (d07 / p18 / d36) on a corpus
    * whose exact-drop set is HALF the corpus — the exact shape on which
    * round 15's hinted `broadcast(exactDrop)` would have built a
    * corpus-fraction hash relation (8-GB hard limit at ~10⁹ docs). The
    * fixed plans compute the exact verdict inline from the fp window (no
    * drop-list relation exists to broadcast) and leave the near-dup join
    * to AQE. Evidence printed: the measured drop fraction + what the old
    * hint would have broadcast, a structural zero-hint assertion on
    * d07's analyzed plan, and walls vs the 1× base corpus. */
  private def dupHeavyWave(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, outDir: String, k: Int, reuse: Boolean): Unit = {
    def minOf2(f: => Long): (Double, Long) = {
      def once(): (Double, Long) = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (tA, rows) = once(); val (tB, _) = once()
      (math.min(tA, tB), rows)
    }
    val dup = s"$outDir/dupheavy"
    if (!reuse ||
        !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dup/documents.parquet"))) {
      dupHeavyDocs(spark.read.parquet(s"$sfDir/documents.parquet"), k)
        .write.mode("overwrite").parquet(s"$dup/documents.parquet")
    }
    // Accounting: the drop-set share of the corpus — the relation the
    // round-15 hint promised was "≪ corpus".
    val verdict = SparkEntry.queries("d07_dedup_keep_list")(spark, dup)
    val acct = verdict.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("reason") === "exact_dup", 1L).otherwise(0L)).as("n_exact_drop"))
      .head()
    val frac = acct.getLong(1).toDouble / acct.getLong(0)
    println(f"[skew] dupheavy drop-set share: ${acct.getLong(1)} of " +
      f"${acct.getLong(0)} docs = ${100 * frac}%.1f%% — at 10^9 docs the " +
      f"old hint would broadcast ~${frac * 1e9 * 24 / 1e9}%.1f GB of doc_ids " +
      "(over Spark's 8-GB limit with row overhead); the fixed plan has no " +
      "drop-list relation at all")
    // Structural: zero broadcast hints anywhere in the verdict plan.
    val hints = verdict.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }.size
    assert(hints == 0, s"keep-verdict plan carries $hints broadcast hint(s)")
    println(s"[skew] dupheavy d07 analyzed plan: $hints broadcast hints (must be 0)")
    Seq("d07_dedup_keep_list", "p18_dedup_token_ledger",
        "d36_release_dedup_report", "d37_release_delta_report").foreach { name =>
      val fn = SparkEntry.queries(name)
      val (t1, _) = minOf2(fn(spark, sfDir).count())
      val (tD, rD) = minOf2(fn(spark, dup).count())
      println(f"[skew] ${name + "_dupheavy"}%-30s $t1%7.2f ${tD}%8.2f ${tD / t1}%6.1fx (rows $rD)")
    }
  }

  /** Hot-cell embedding corpus: the k× uniform vector corpus with HALF of
    * all vectors re-pointed into one tight cluster around the base
    * corpus's lowest-id vector — after IVF training, one cell ends up
    * holding ~50% of stored vectors, the clustered-real-data shape that
    * attacks cell-partitioned ANN serving (one cell's candidate scan
    * dominates every probe that touches it). `exactDup = true` is the
    * harsher variant: the re-pointed half are BYTE-IDENTICAL copies of
    * the hot vector (mirrored embeddings of mirrored documents), which
    * also floods top-k with cos-1.0 ties — the determinism tie-rule's
    * stress case. Jitter is deterministic in (vec_id, dim), so corpora
    * are rebuild-stable. */
  def hotCellVecs(vecs: DataFrame, k: Int, exactDup: Boolean): DataFrame = {
    val hot = vecs.orderBy("vec_id").select("embedding").head()
      .getSeq[Float](0).toArray
    val hotArr = array(hot.map(x => lit(x)): _*)
    val clustered =
      if (exactDup) hotArr.cast("array<float>")
      else transform(hotArr, (x, i) =>
        x + pmod(col("vec_id") * 31L + i.cast("long"), lit(1009L))
          .cast("double") / lit(100000.0))
        .cast("array<float>")
    ScaleRehearsal.scaledVecs(vecs, k).withColumn("embedding",
      when(col("vec_id") % 2 === 0, clustered).otherwise(col("embedding")))
  }

  /** Round-15 vector-skew wave: the hot-IVF-cell / duplicated-vector
    * corpora s17 exists to measure, run against every ANN family member
    * (s02 LSH, s04 IVF, s08 PQ) through the generic `...From` builders
    * (train + probe on the adversarial corpus — the memo never sees
    * synthetic corpora), with recall vs the SAME corpus's brute-force
    * truth and s17's balance report read directly. The design claims
    * this pins: (a) probe-side traffic is structurally bounded by
    * nProbe — a query fans out to exactly nProbe cells no matter how hot
    * one cell is, so probe counts can never exceed nQueries × nProbe;
    * (b) the hot cell's cost is its candidate SCAN (≈50% of the corpus
    * for probes that touch it) — visible as a wall ratio vs the uniform
    * corpus of the same k, bounded by ~the hot share, never quadratic;
    * (c) recall floors hold because the hot queries' true neighbors ARE
    * in the hot cell they probe first. */
  private def vecSkewWave(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, outDir: String, k: Int, reuse: Boolean): Unit = {
    def minOf2(f: => Long): (Double, Long) = {
      def once(): (Double, Long) = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (tA, rows) = once(); val (tB, _) = once()
      (math.min(tA, tB), rows)
    }
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    if (!reuse) {
      ScaleRehearsal.scaledVecs(vecs, k).write.mode("overwrite")
        .parquet(s"$outDir/vecuniform/embeddings.parquet")
      hotCellVecs(vecs, k, exactDup = false).write.mode("overwrite")
        .parquet(s"$outDir/vechot/embeddings.parquet")
      hotCellVecs(vecs, k, exactDup = true).write.mode("overwrite")
        .parquet(s"$outDir/vecdup/embeddings.parquet")
    }
    val (nq, topK) = (10, 5)
    for (tag <- Seq("vecuniform", "vechot", "vecdup")) {
      val e = spark.read.parquet(s"$outDir/$tag/embeddings.parquet")
        .select(col("vec_id"), col("embedding")).localCheckpoint()
      val truth = operators.Similarity.bruteForceTopKFrom(e, nq, topK)
        .localCheckpoint()
      val truthN = truth.count()
      def recallOf(approx: DataFrame): Double =
        approx.select("query_id", "neighbor_id")
          .join(truth.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"), "leftsemi")
          .count().toDouble / truthN
      val methods = Seq[(String, () => DataFrame)](
        "s02_lsh" -> (() => operators.Similarity.lshTopKFrom(e, nq, topK)),
        "s04_ivf" -> (() => operators.Similarity.ivfTopKFrom(spark, e, nq, topK)),
        // The SHIPPED default (AutoRerank): the tuner walks the measured
        // recall curve at build time and picks the smallest rung ≥ 0.9 —
        // on clustered corpora that lands at 128+ where the old fixed
        // default sat at 8.
        "s08_pq" -> (() => operators.Similarity.pqTopKFrom(spark, e, nq, topK)),
        // The RETIRED fixed default, kept as the regression reference:
        // a tight cluster eats codebook cells, so ADC can't separate
        // in-cluster neighbors (round-15 measurement on vechot at
        // sf0.01-4x: recall 0.52 @ 8, 0.66 @ 32, 0.96 @ 128, 1.0 @ 512)
        // — the row that motivated the auto-tuner.
        "s08_pq_rerank8" -> (() =>
          operators.Similarity.pqTopKFrom(spark, e, nq, topK, rerank = 8)))
      methods.foreach { case (m, build) =>
        val (t, _) = minOf2(build().count())
        println(f"[skew] ${m + "/" + tag}%-28s $t%7.2f s recall=${recallOf(build())}%.3f")
      }
      // s17's balance readout on the same corpus: the hot cell must show
      // up as a storage-share outlier while probe traffic stays
      // nProbe-bounded.
      val bal = operators.Similarity.probeTrafficBalance(e).localCheckpoint()
      val top = bal.orderBy(desc("storage_share")).head()
      val probes = bal.agg(sum("n_probes"), max("n_probes")).head()
      println(f"[skew] s17_balance/$tag%-16s max_storage_share=${top.getDouble(2)}%.3f " +
        f"(cell ${top.getLong(0)}) probes_total=${probes.getLong(0)} " +
        f"probes_max_cell=${probes.getLong(1)}")
    }
  }

  /** Round-11 boilerplate wave: the remaining shingle-join consumers.
    * Walls for the structurally-bounded/capped ones; df-table accounting
    * (never executed) for the corpus×corpus terms d09/d19's %19 query
    * slice would hit; a bounded-eval run for d09/d19's production
    * contract with the boilerplate ON BOTH SIDES. */
  private def boilerWave2(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, outDir: String): Unit = {
    import spark.implicits._
    def minOf2(f: => Long): (Double, Long) = {
      def once(): (Double, Long) = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (tA, rows) = once(); val (tB, _) = once()
      (math.min(tA, tB), rows)
    }
    // Walls: d21 (capped kernel), d20 (≤ #sources² pairs), d22 (LSH-gated
    // candidates), d23/t34 (shingle-keyed aggregates). Ratio baseline is
    // the same query at 1× — the boiler corpus must stay in each query's
    // uniform band.
    Seq("d21_split_leakage", "d20_cross_source_overlap",
      "d22_sketch_calibration", "d23_boilerplate_report",
      "t34_templated_docs").foreach { name =>
      val fn = SparkEntry.queries(name)
      val (t1, _) = minOf2(fn(spark, sfDir).count())
      val (tB, rB) = minOf2(fn(spark, s"$outDir/boiler").count())
      println(f"[skew] ${name + "_boiler"}%-30s $t1%7.2f ${tB}%8.2f ${tB / t1}%6.1fx (rows $rB)")
    }
    // Accounting (5-gram shingles — d09/d19/d21's scale): per shingle the
    // val×train (d21) and corpus×eval (d09/d19 %19-slice form) pair terms,
    // uncapped vs sub-cap-qualified. Computed from the df table; the
    // uncapped corpus×corpus execution is unnecessary — that term IS the
    // detonator.
    val boilerDocs = spark.read.parquet(s"$outDir/boiler/documents.parquet")
    val sh5 = operators.Dedup.hashedShingles(
      operators.Dedup.shingleSets(boilerDocs, 5)).localCheckpoint()
    val marked = sh5
      .withColumn("val_side",
        operators.Sampling.hashBucket(col("doc_id")) < 10)
      .withColumn("eval_side", col("doc_id") % 19 === 0)
    val perSh = marked.groupBy("sh_h").agg(
      count(lit(1)).as("df"),
      sum(when(col("val_side"), 1L).otherwise(0L)).as("df_v"),
      sum(when(col("eval_side"), 1L).otherwise(0L)).as("df_e"))
    val cap = operators.Dedup.ShingleDfCap
    val acct = perSh.agg(
      sum(expr("df_v * (df - df_v)")).as("d21_uncapped"),
      sum(when(col("df") <= cap, expr("df_v * (df - df_v)")).otherwise(lit(0L)))
        .as("d21_capped"),
      sum(expr("df_e * (df - df_e)")).as("d09_slice_uncapped"),
      sum(when(col("df") <= cap, expr("df_e * (df - df_e)")).otherwise(lit(0L)))
        .as("d09_slice_capped")).head()
    println(f"[skew] d21 val×train join work: uncapped=${acct.getLong(0).toDouble}%.3e " +
      f"pair-rows vs capped=${acct.getLong(1).toDouble}%.3e " +
      f"(${100.0 * (1 - acct.getLong(1).toDouble / acct.getLong(0))}%.2f%% pruned)")
    println(f"[skew] d09/d19 %%19-slice join work (NOT the shipped contract): " +
      f"uncapped=${acct.getLong(2).toDouble}%.3e pair-rows " +
      f"(sub-cap ${acct.getLong(3).toDouble}%.3e) — corpus-proportional eval " +
      "is the d21 detonator shape; production evals are bounded:")
    // The production d09/d19 contract: eval set FIXED (the 1× corpus's %19
    // slice, boilerplate appended like everything else) while the corpus
    // scales. Fan-out ≤ |eval shingles| × max df — linear in corpus bytes.
    val evalBase = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 19 === 0)
      .withColumn("text", concat(col("text"),
        lit(" all rights reserved contact us terms of service apply to this site")))
    val corpusSide = boilerDocs.filter(col("doc_id") % 19 =!= 0)
    val (tD09, r09) = minOf2(
      operators.Dedup.decontaminate(corpusSide, evalBase, 5).count())
    val (tD19, r19) = minOf2(
      operators.Dedup.evalLeakReport(corpusSide, evalBase, 5).count())
    println(f"[skew] d09_bounded_eval_boiler          ${tD09}%8.2f s (rows $r09)")
    println(f"[skew] d19_bounded_eval_boiler          ${tD19}%8.2f s (rows $r19)")
    // Round-12: the SHIPPED %19-slice query form itself, now riding the
    // df-capped bipartite kernel — the exact shape the accounting above
    // prices at ~1e9 uncapped pair rows EXECUTES here, and must land in
    // the capped-dedup band (d21's boiler row), not detonate.
    Seq("d09_decontaminate", "d19_eval_leak_report").foreach { name =>
      val fn = SparkEntry.queries(name)
      val (t1, _) = minOf2(fn(spark, sfDir).count())
      val (tB, rB) = minOf2(fn(spark, s"$outDir/boiler").count())
      println(f"[skew] ${name + "_boiler_shipped"}%-30s $t1%7.2f ${tB}%8.2f ${tB / t1}%6.1fx (rows $rB)")
    }
  }
}

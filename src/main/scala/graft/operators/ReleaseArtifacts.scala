package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable release-artifact layout for the dedup kernel — the production
  * form of [[Dedup.CorpusMemo]]'s session checkpoints, and the 100 TB
  * design point the memo scaladoc names: a pipeline computes the corpus
  * shingle / signature / band / candidate / verified-pair / cluster tables
  * ONCE per corpus freeze and every downstream report (d36, the d-family
  * rollups, the next wave's incremental gate) READS them. Session
  * checkpoints die with the driver; this layout survives it:
  *
  * ```
  * <path>/hs/              (doc_id, sh_h)            word-3-gram hashes
  * <path>/sigs/            (doc_id, sig)             MinHash signatures
  * <path>/banded/          (doc_id, band, bucket)    LSH band table
  * <path>/bucket_ids/      (band, bucket, ids)       capped memberships
  * <path>/cand/            (a, b)                    LSH candidate pairs
  * <path>/verified/        (a, b, jaccard)           exact-verified pairs
  * <path>/capped_jaccard/  (a, b, jaccard)           df-capped pair scores
  * <path>/clusters/        (cluster_rep, doc_id, cluster_size)
  * <path>/_manifest.json   corpus stamp + kernel parameters
  * ```
  *
  * The manifest pins (a) the CORPUS CONTENT STAMP — [[graft.MemoLedger
  * .dirStamp]] over the source dir at freeze time, so a reader opening
  * the artifacts against a corpus that has since changed fails loudly
  * instead of reporting on stale data — and (b) the kernel parameters
  * (shingle n, MinHash bands, bucket cap, df cap, cluster threshold) the
  * artifacts were computed under, so artifacts from an older kernel
  * configuration can never be silently served as the current one.
  *
  * [[open]] installs each table into the session memo as a parquet-backed
  * DataFrame: every memo consumer (d02/d06/d36/p18/...) then runs off the
  * persisted set with ZERO build cost — read-marginal ≈ session-marginal
  * (SCALE.md carries the measured row). Eviction's freeCheckpoint is a
  * no-op on parquet-backed plans, so the install is lifecycle-safe.
  */
object ReleaseArtifacts {

  /** Artifact name ↔ memo key, in dependency order. The memo keys embed
    * the parameters they were built under; the manifest re-checks those
    * parameters at open time. */
  private def tableKeys(threshold: Double): Seq[(String, String)] = Seq(
    "hs" -> "hs@3",
    "sigs" -> "sigs",
    "banded" -> "banded",
    "bucket_ids" -> s"bucketIds@${Dedup.BandBucketCap}",
    "cand" -> "cand",
    "verified" -> "verified",
    "capped_jaccard" -> "cappedJaccard",
    "clusters" -> s"clusters@$threshold@50")

  private def manifestJson(stamp: Long, threshold: Double): String =
    s"""{"stamp":$stamp,"shingle_n":3,"num_perms":${Dedup.NumPerms},""" +
      s""""bands":${Dedup.Bands},"band_bucket_cap":${Dedup.BandBucketCap},""" +
      s""""shingle_df_cap":${Dedup.ShingleDfCap},"threshold":$threshold,""" +
      s""""cc_max_iters":50}"""

  /** Freeze corpus `d`'s kernel artifacts under `path`. Builds (or
    * reuses) the session memo's checkpoints, then persists each as
    * parquet plus the manifest — one tokenize pass total, amortized over
    * every future reader. The manifest is written LAST: a crash mid-write
    * leaves no manifest, and [[open]] refuses a manifest-less layout, so
    * partial freezes are unreadable rather than wrong. */
  def write(spark: SparkSession, d: String, path: String,
      threshold: Double = 0.5): Unit = {
    val stamp = graft.MemoLedger.dirStamp(d)
    val byKey: Map[String, DataFrame] = Map(
      "hs@3" -> Dedup.corpusShingleHashes(spark, d),
      "sigs" -> Dedup.corpusSigs(spark, d),
      "banded" -> Dedup.corpusBanded(spark, d),
      s"bucketIds@${Dedup.BandBucketCap}" -> Dedup.corpusBucketIds(spark, d),
      "cand" -> Dedup.corpusCand(spark, d),
      "verified" -> Dedup.corpusVerifiedPairs(spark, d),
      "cappedJaccard" -> Dedup.corpusCappedJaccard(spark, d),
      s"clusters@$threshold@50" -> Dedup.corpusClusterTable(spark, d, threshold, 50))
    tableKeys(threshold).foreach { case (table, key) =>
      byKey(key).write.mode("overwrite").parquet(s"$path/$table")
    }
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(path, "_manifest.json"), true)
    try out.write(manifestJson(stamp, threshold).getBytes("UTF-8"))
    finally out.close()
  }

  private def manifestField(json: String, field: String): String = {
    val m = ("\"" + field + "\":([-0-9.eE]+)").r.findFirstMatchIn(json)
    m.map(_.group(1)).getOrElse(
      throw new IllegalStateException(s"release manifest missing '$field': $json"))
  }

  /** Open a frozen artifact set for corpus `d`: verify the manifest's
    * corpus stamp and kernel parameters against the CURRENT corpus and
    * kernel, then install every table into the session memo as a
    * parquet-backed DataFrame. Throws (never silently recomputes or
    * serves stale data) when the corpus has changed since the freeze or
    * the kernel parameters differ. */
  def open(spark: SparkSession, d: String, path: String,
      threshold: Double = 0.5): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mPath = new Path(path, "_manifest.json")
    if (!fs.exists(mPath))
      throw new IllegalStateException(
        s"no release manifest at $path — not a frozen artifact set (or a " +
        "crashed freeze: the manifest is written last)")
    val in = fs.open(mPath)
    val json =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val stamp = manifestField(json, "stamp").toLong
    val now = graft.MemoLedger.dirStamp(d)
    if (stamp != now)
      throw new IllegalStateException(
        s"corpus $d changed since the freeze at $path (stamp $now != frozen " +
        s"$stamp) — re-freeze before reading release artifacts")
    val expect = manifestJson(stamp, threshold)
    Seq("shingle_n", "num_perms", "bands", "band_bucket_cap", "shingle_df_cap",
        "threshold", "cc_max_iters").foreach { f =>
      val got = manifestField(json, f)
      val want = manifestField(expect, f)
      if (got != want)
        throw new IllegalStateException(
          s"release artifacts at $path were frozen under $f=$got but the " +
          s"current kernel uses $f=$want — re-freeze under the current kernel")
    }
    tableKeys(threshold).foreach { case (table, key) =>
      Dedup.CorpusMemo.install(spark, d, key, spark.read.parquet(s"$path/$table"))
    }
  }
}

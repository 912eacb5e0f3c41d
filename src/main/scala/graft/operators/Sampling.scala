package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Deterministic sampling for training-data pipelines.
  *
  * Random sampling (`df.sample`) is irreproducible across runs, engines and
  * partition layouts — unacceptable when a 100 TB corpus snapshot must be
  * re-derivable. These operators sample by **content hash**: a row is kept
  * iff `md5(key) mod 100 < rate`, so the decision is a pure function of the
  * key — stable under re-partitioning, retries, incremental re-runs, and
  * reproducible in any engine with md5 (the DuckDB oracles compute the
  * identical buckets). Both are map-only (no shuffle, no RNG state); the
  * filter sits directly on the scan.
  *
  * The md5-bucket idea is the same routing primitive the reference uses for
  * shuffle partitioning (reference `mapreduce/worker/__main__.py:62-65`),
  * reused here as a sampling decision.
  */
object Sampling {

  /** `md5(key) mod 100` via the first 8 hex digits (32 bits is plenty for a
    * percentage decision; full-digest mod would need BigInt in both engines). */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % 100

  private val bucketSql =
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"

  /** Uniform 10% deterministic Bernoulli sample of documents. */
  val hashSample = Q(
    "q23_hash_sample",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("bucket", hashBucket(col("doc_id")))
        .filter(col("bucket") < 10)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("bucket"))
        .orderBy("doc_id"),
    Some(s"""SELECT doc_id, lang, n_chars, $bucketSql AS bucket
             FROM documents
             WHERE $bucketSql < 10
             ORDER BY doc_id"""))

  /** Stratified sample: downsample the majority class (en → 25%), keep most
    * of the rest (→ 80%) — the class-rebalancing step of a training-mix
    * pipeline. Per-stratum rate is a CASE over the same hash bucket, so the
    * plan stays a single map-only filter (no per-group pass, no shuffle). */
  val stratifiedSample = Q(
    "q24_stratified_sample",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("bucket", hashBucket(col("doc_id")))
        .filter(col("bucket") <
          when(col("lang") === "en", lit(25)).otherwise(lit(80)))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy("lang"),
    Some(s"""SELECT lang, count(*) AS n_sampled
             FROM documents
             WHERE $bucketSql < CASE WHEN lang = 'en' THEN 25 ELSE 80 END
             GROUP BY lang
             ORDER BY lang"""))

  val all: Seq[Q] = Seq(hashSample, stratifiedSample)
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, TextOps}
import graft.sources.Tables

/** Sampling + chunking invariants that the DuckDB hash-equality oracle
  * can't express: determinism under re-partitioning, stratum rates, and
  * lossless chunk coverage.
  */
class SamplingSpec extends SparkSpec {

  test("hash sample is deterministic and partition-layout independent") {
    val a = Sampling.hashSample.fn(spark, sf).collect().map(_.getLong(0)).toSeq
    val again = Sampling.hashSample.fn(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(a == again, "same plan, different sample — non-deterministic")
    // Same decision regardless of physical layout: recompute the kept set
    // from a differently-partitioned scan.
    val relaid = Tables.documents(spark, sf)
      .repartition(7, col("lang"))
      .withColumn("bucket", Sampling.hashBucket(col("doc_id")))
      .filter(col("bucket") < 10)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(relaid == a, "partition layout changed the sample")
  }

  test("hash sample rate is ~10% and is a subset of the corpus") {
    val total = Tables.documents(spark, sf).count()
    val ids = Sampling.hashSample.fn(spark, sf).collect().map(_.getLong(0)).toSet
    val all = Tables.documents(spark, sf).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(all))
    val rate = ids.size.toDouble / total
    assert(rate > 0.04 && rate < 0.20, s"10% target, got $rate")
  }

  test("stratified sample downsamples 'en' harder than other strata") {
    val sampled = Sampling.stratifiedSample.fn(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = sampled("en").toDouble / totals("en")
    val deRate = sampled("de").toDouble / totals("de")
    assert(enRate < 0.45, s"en rate $enRate should be near 0.25")
    assert(deRate > 0.55, s"de rate $deRate should be near 0.80")
    assert(enRate < deRate)
  }

  test("chunks reassemble to the original text (stride < width ⇒ lossless)") {
    val doc = Tables.documents(spark, sf)
      .select("doc_id", "text").orderBy("doc_id").limit(1)
      .collect().head
    val (id, text) = (doc.getLong(0), doc.getString(1))
    val chunks = TextOps.chunk.fn(spark, sf)
      .filter(col("doc_id") === id)
      .orderBy("start")
      .collect().map(r => (r.getInt(1), r.getString(2)))
    // Each chunk starts at 1 + k*150 and overlaps the previous by 50 chars.
    assert(chunks.head._1 == 1)
    val rebuilt = chunks.map(_._2).reduceLeft((acc, c) => acc + c.drop(
      math.min(50, c.length)))
    assert(rebuilt == text, "chunk overlap-merge must reproduce the document")
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.{Dedup, Multimodal}
import graft.sources.Tables
import graft.streaming.{DocStreams, EventStreams, MediaStreams}

/** State-size bounds for the streaming twins, pinned at 10× volume.
  *
  * The equivalence specs prove the twins emit batch-identical rows; these
  * prove the CLAIMED state bounds — the property that decides whether a
  * twin survives an unbounded stream. Both are driven through a mid-query
  * wave boundary (state must persist across micro-batches to be measured
  * at all) on a 10× corpus, and read the state-store row counts from the
  * query's progress events:
  *
  *  - [[MediaStreams.shardAssigned]] claims O(#writers) state (one byte
  *    cursor per writer): with 2 writers and 10× records, the state store
  *    must hold exactly 2 rows — record-proportional state would show up
  *    as thousands here.
  *  - [[DocStreams.releaseGate]] claims ZERO state (pure per-row
  *    decisions against broadcast evidence): its progress events must
  *    report no stateful operator rows at any volume.
  */
class StreamingStateBoundSpec extends SparkSpec {

  private def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Seq[Long] =
    q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq).map(_.numRowsTotal)

  test("shardAssigned state stays at #writers (2) under 10x volume across waves") {
    val base = Files.createTempDirectory("graft-shard-state").toString
    val media1x = Multimodal.mediaTable(spark, sf).toDF()
    val stride = media1x.agg(max("doc_id")).head().getLong(0) + 1L
    val media10x = (0 until 10).map { i =>
      media1x.withColumn("doc_id", col("doc_id") + lit(i * stride))
    }.reduce(_ unionAll _)
      .withColumn("media_type",
        when(col("doc_id") % 2 === 0, lit("image/stub")).otherwise(lit("audio/stub")))
    val n10x = media10x.filter(octet_length(col("payload")) > 0).count()
    val split = stride * 5
    media10x.filter(col("doc_id") < split).coalesce(1)
      .write.mode("overwrite").parquet(s"$base/arrivals")
    val q = EventStreams.runToMemory(
      MediaStreams.shardAssigned(
        MediaStreams.readMediaStream(spark, s"$base/arrivals", media10x)).toDF(),
      "shard_state_out", OutputMode.Append)
    try {
      q.processAllAvailable()
      media10x.filter(col("doc_id") >= split).coalesce(1)
        .write.mode("append").parquet(s"$base/arrivals")
      q.processAllAvailable()
      // All 10x records were assigned (volume actually flowed)...
      assert(spark.table("shard_state_out").count() == n10x)
      // ...while the state store held exactly one cursor per writer in
      // every progress event that ran the stateful operator.
      val rows = stateRows(q).filter(_ > 0)
      assert(rows.nonEmpty, "no stateful progress recorded — fixture degenerate")
      assert(rows.forall(_ == 2L),
        s"shardAssigned state not O(#writers): rows=$rows (expected all 2)")
    } finally q.stop()
  }

  test("releaseGate runs with ZERO state rows under 10x volume across waves") {
    val base = Files.createTempDirectory("graft-gate-state").toString
    val docs1x = Tables.documents(spark, sf)
    val stride = docs1x.agg(max("doc_id")).head().getLong(0) + 1L
    val docs10x = (0 until 10).map { i =>
      docs1x.withColumn("doc_id", col("doc_id") + lit(i * stride))
    }.reduce(_ unionAll _)
    val split = stride * 5
    docs10x.filter(col("doc_id") >= 25 && col("doc_id") < split).coalesce(1)
      .write.mode("overwrite").parquet(s"$base/documents.parquet")
    val evalCounts = DocStreams.evalShingleCounts(docs1x.filter(col("doc_id") < 25), 5)
    val evidence = Dedup.embeddingDecontaminateFrom(
      Tables.embeddings(spark, sf), nEval = 25, threshold = 0.35)
    val q = EventStreams.runToMemory(
      DocStreams.releaseGate(spark,
        DocStreams.readDocumentStream(spark, base), evalCounts, evidence),
      "gate_state_out", OutputMode.Append)
    try {
      q.processAllAvailable()
      docs10x.filter(col("doc_id") >= split).coalesce(1)
        .write.mode("append").parquet(s"$base/documents.parquet")
      q.processAllAvailable()
      assert(spark.table("gate_state_out").count() > 0)
      val rows = stateRows(q)
      assert(rows.forall(_ == 0L),
        s"releaseGate is supposed to be stateless: state rows=$rows")
    } finally q.stop()
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Similarity

/** Streaming twin of the s07 incremental-ANN surface: vectors as an
  * arriving stream, appended to the persisted IVF index per micro-batch.
  *
  * The append is [[graft.operators.Similarity.ivfAppendIndex]] inside
  * `foreachBatch`: cell assignment against the persisted codebook is
  * stateless per-row work (codebook broadcast, no shuffle besides the
  * cell-keyed write), so micro-batch cost is O(batch) and there is NO
  * streaming state at all — durability lives in the index itself, and the
  * probe path serves newly ingested vectors as soon as their micro-batch
  * commits. Exactly-once caveat, stated rather than hidden: a plain
  * parquet append is not idempotent under micro-batch REPLAY (a crash
  * between the parquet commit and the checkpoint advance re-appends that
  * batch); production either fans the batch into a transactional table
  * format or dedups on vec_id at probe time. The checkpoint bounds the
  * window to one batch.
  */
object VectorStreams {

  /** Vectors as a file stream over a staging directory (the staged-ingest
    * shape [[DocStreams.readDocumentStream]] uses for documents); one file
    * per micro-batch. */
  def readVectorStream(spark: SparkSession, dir: String, schemaFrom: DataFrame): DataFrame =
    spark.readStream
      .schema(schemaFrom.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Start the ingest: every micro-batch of (vec_id, embedding) rows is
    * assigned under the index's persisted codebook and appended to its
    * cell partitions. */
  def appendToIndex(stream: DataFrame, indexPath: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty)
          Similarity.ivfAppendIndex(batch.sparkSession, batch.toDF(), indexPath)
      }
      .start()

  /** Streaming twin of batch d17 (`Dedup.embeddingDecontaminate`): score
    * every ARRIVING vector against the bounded eval/benchmark embedding
    * set and emit the flagged rows — the decontamination gate an ingest
    * pipeline runs BEFORE a vector enters the index. The scoring pass is
    * the shared [[graft.operators.Dedup.scoreAgainstEval]] column: eval
    * vectors are literal-inlined, so this is stateless per-row work — no
    * watermark, no state store, no shuffle; the stream ≡ batch
    * equivalence is exact (spec-asserted), not an eventual-consistency
    * approximation. */
  def decontaminateStream(stream: DataFrame,
      evalSet: Array[(Long, Array[Float])], threshold: Double): DataFrame =
    graft.operators.Dedup.scoreAgainstEval(stream, evalSet, threshold)

  /** Streaming twin of s15's assignment half: route every ARRIVING vector
    * to its cluster under a FROZEN centroid table (the batch Lloyd loop's
    * [[graft.operators.Similarity.kmeansCentroids]] output — training
    * needs the closed corpus; serving doesn't). The assignment is the
    * SHARED [[graft.operators.Similarity.centroidBest]] column over
    * literal-inlined centroid sums: stateless per-row work — no
    * watermark, no state store, no shuffle — so stream ≡ batch is the
    * same codegen'd expression, not a reimplementation, and the
    * micro-batch slicing cannot move any row's cluster. This is the
    * corpus-cartography ingest gate: tag each new document's embedding
    * with its topic cluster (and the −2 sentinel surfaces broken
    * zero-norm vectors) before it reaches the index. */
  def cartographyGate(stream: DataFrame,
      cents: Seq[(Long, Seq[Long])]): DataFrame = {
    import org.apache.spark.sql.functions._
    // No centroids yet (kmeansCentroids on an empty resident corpus
    // returns Nil — the first deployment day): every vector passes
    // through UNASSIGNED (cluster −1, NULL cosine) instead of the
    // zero-arg array_min analysis error a naive centroidBest call hits.
    if (cents.isEmpty)
      stream.select(col("vec_id"),
        lit(-1L).as("cluster_id"), lit(null).cast("double").as("cos"))
    else
      stream
        .select(col("vec_id"), Similarity.quantMilli.as("qe"))
        .withColumn("b", Similarity.centroidBest(cents, col("qe")))
        .select(col("vec_id"), col("b.c").as("cluster_id"),
          (-col("b.nc")).as("cos"))
  }
}

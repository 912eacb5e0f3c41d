package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of q43's incremental view maintenance: the pricing
  * summary as a PERSISTED state table, refreshed per micro-batch of
  * arriving lineitem rows. Each batch costs one batch-proportional
  * aggregate plus a #groups-sized merge against the stored state — the
  * resident corpus is never rescanned, which is q43's entire point
  * restated in `foreachBatch`.
  *
  * Correctness rides q43's design, not streaming luck: the partial
  * states are centi-unit BIGINTs, so the merge is ASSOCIATIVE and any
  * micro-batch slicing of the input converges to the full recompute —
  * the spec streams the same rows in different batchings and asserts
  * the final state equals the one-shot aggregate row-for-row. Same
  * exactly-once caveat as [[VectorStreams.appendToIndex]], stated not
  * hidden: a crash between the state overwrite and the checkpoint
  * advance replays one batch, which a production run absorbs with a
  * transactional table format (or a batch-id column in the state).
  */
object ViewStreams {

  /** Lineitem rows as a file stream over a staging directory (one file
    * per micro-batch — the staged-ingest shape the other stream twins
    * use). */
  def readLineitemStream(spark: SparkSession, dir: String,
      schemaFrom: DataFrame): DataFrame =
    spark.readStream
      .schema(schemaFrom.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** One batch's partial state: (group, centi-quantity sum, row count). */
  private def partialState(rows: DataFrame): DataFrame =
    rows.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(floor(col("l_quantity") * 100 + 0.5).cast("long")).as("qc"),
        count(lit(1)).as("c"))

  /** Merge two partial states (associative — exact BIGINT sums). */
  private def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("l_returnflag"), col("l_linestatus"),
        col("qc").as("aq"), col("c").as("ac"))
      .join(b.select(col("l_returnflag"), col("l_linestatus"),
        col("qc").as("bq"), col("c").as("bc")),
        Seq("l_returnflag", "l_linestatus"), "full_outer")
      .select(col("l_returnflag"), col("l_linestatus"),
        (coalesce(col("aq"), lit(0L)) + coalesce(col("bq"), lit(0L))).as("qc"),
        (coalesce(col("ac"), lit(0L)) + coalesce(col("bc"), lit(0L))).as("c"))

  /** Start the maintenance loop: per micro-batch, aggregate the batch,
    * merge into the persisted state at `statePath`, overwrite. The
    * `localCheckpoint` before the overwrite materializes the merged
    * state off the files being replaced (Spark cannot overwrite a path
    * an unmaterialized plan still reads). */
  def maintainPricingView(stream: DataFrame, statePath: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val delta = partialState(batch.toDF())
          // First-batch detection is an explicit existence check, NOT a
          // catch-all: a corrupt or half-written state file (the
          // documented crash window) must FAIL the batch loudly, never
          // silently reset the view to this batch's rows.
          val path = new org.apache.hadoop.fs.Path(statePath)
          val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val prev =
            if (fs.exists(path)) spark.read.parquet(statePath)
            else spark.createDataFrame(
              spark.sparkContext.emptyRDD[Row], delta.schema)
          merge(prev, delta).localCheckpoint()
            .write.mode("overwrite").parquet(statePath)
        }
      }
      .start()

  /** Read the maintained view in q43's output shape (sans the
    * delta-attribution column, which is per-refresh bookkeeping). */
  def pricingView(spark: SparkSession, statePath: String): DataFrame =
    spark.read.parquet(statePath)
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("qc").cast("double") / 100.0, 2).as("sum_qty"),
        col("c").as("count_rows"))
      .orderBy("l_returnflag", "l_linestatus")
}

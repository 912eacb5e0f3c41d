package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Parquet table sources over a scale-factor directory (TESTDATA.md).
  *
  * Plain `spark.read.parquet` so Catalyst keeps predicate pushdown, column
  * pruning and partition pruning; at cluster scale these would be the same
  * calls over an object-store path. Generalizes the reference's directory
  * scan source (reference `mapreduce/manager/__main__.py:320-327` lists and
  * sorts input files; Spark's FileSourceScanExec does the equivalent file
  * enumeration + split packing for us).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalizeTimestamps(spark.read.parquet(s"$sfDir/$name.parquet"))

  /** Cast every TIMESTAMP_NTZ column to TIMESTAMP. The testdata's parquet
    * timestamp encoding has changed across harness rounds (nanos-as-long,
    * then micros-NTZ, i.e. micros without the isAdjustedToUTC flag, which
    * Spark 4 surfaces as TIMESTAMP_NTZ when `inferTimestampNTZ` is on) and
    * functions like `unix_micros` strictly require TIMESTAMP — so the
    * source boundary is where encoding volatility dies. Under the UTC
    * session time zone (GraftSession) the cast is value-preserving and
    * matches DuckDB's naive read of the same files, keeping oracle parity.
    * A single select (not N withColumns) keeps this one projection node. */
  def normalizeTimestamps(df: DataFrame): DataFrame = {
    val cols: Array[Column] = df.schema.fields.map { f =>
      f.dataType match {
        case TimestampNTZType => col(f.name).cast(TimestampType).as(f.name)
        case _                => col(f.name)
      }
    }
    if (df.schema.exists(_.dataType == TimestampNTZType)) df.select(cols.toIndexedSeq: _*)
    else df
  }

  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  /** events.ts has shipped in three parquet encodings across harness
    * rounds. TIMESTAMP(NANOS): with `spark.sql.legacy.parquet.nanosAsLong`
    * it surfaces as a long which we convert (truncating) to a microsecond
    * timestamp — the same µs truncation DuckDB's epoch_us applies.
    * Micros-NTZ and micros-UTC: [[normalizeTimestamps]] (inside [[load]])
    * already yields TIMESTAMP for both. All three land on identical
    * values under the UTC session, keeping oracle parity. */
  def events(spark: SparkSession, d: String): DataFrame = {
    val raw = load(spark, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")

  /** Register every table as a temp view so the whole corpus is queryable
    * as SQL text (`spark.sql("SELECT ... FROM lineitem ...")`) — same
    * Catalyst plans as the DataFrame surface, same pushdown/pruning. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    all.foreach { t =>
      val df = if (t == "events") events(spark, sfDir) else load(spark, sfDir, t)
      df.createOrReplaceTempView(t)
    }
}

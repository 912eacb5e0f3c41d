package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Tuned for the harness (local[N], single JVM) but every knob is chosen to
  * also be the right default on a large cluster: AQE on (runtime re-plan,
  * skew-join splitting, partition coalescing), shuffle partitions sized to
  * the parallelism actually available instead of Spark's legacy 200, UTC
  * session time zone so timestamp semantics match the DuckDB oracle.
  */
object GraftSession {
  def cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

  def builder(appName: String, parallelism: Int = cpus): SparkSession.Builder =
    SparkSession
      .builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .appName(appName)
      .master(s"local[$parallelism]")
      .config("spark.sql.shuffle.partitions", parallelism.toString)
      .config("spark.default.parallelism", parallelism.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      // The events table stores TIMESTAMP(NANOS); read as long and convert
      // in Tables.events (Spark has no nanosecond timestamp type).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")

  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

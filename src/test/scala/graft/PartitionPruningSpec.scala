package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-lake layout: date-partitioned parquet writes and partition-pruned
  * reads — at 100 TB the partition filter is the difference between
  * scanning a day and scanning the lake.
  */
class PartitionPruningSpec extends SparkSpec {

  test("partitionBy write + partition-pruned read") {
    val out = Files.createTempDirectory("graft-lake").toFile.getAbsolutePath + "/events"
    val events = Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
    events.write.mode("overwrite").partitionBy("event_date").parquet(out)

    val pruned = spark.read.parquet(out)
      .filter(col("event_date") === lit("2024-01-02").cast("date"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_date"),
      s"expected partition filter in scan:\n$plan")
    // Pruning must not change results vs a post-hoc filter.
    val expected = events.filter(to_date(col("ts")) === lit("2024-01-02").cast("date")).count()
    assert(pruned.count() == expected)
    assert(expected > 0, "test date not present in events — pick another day")
  }
}

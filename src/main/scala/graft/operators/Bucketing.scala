package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Bucketed (co-located) joins: pre-shuffle both sides of a recurring join
  * key into the same bucket layout at write time so every subsequent join
  * on that key runs with NO exchange — the standard way to amortize the
  * shuffle of a 100 TB fact table that is joined on the same key daily.
  *
  * Spark's bucketed parquet tables (`bucketBy` + `sortBy` + `saveAsTable`)
  * store the Murmur3 bucket id in the file layout; the planner then proves
  * both sides share the partitioning and elides the Exchange.
  */
object Bucketing {

  /** Write orders and customer bucketed by customer key (idempotent —
    * overwrites), returning the bucketed join DataFrame. The caller can
    * assert the plan has no ShuffleExchange under the join. */
  def bucketedOrdersCustomerJoin(spark: SparkSession, d: String, buckets: Int = 8): DataFrame = {
    // Drop table AND stale location (a fresh session forgets managed tables
    // but their warehouse directories survive JVM restarts).
    Seq("orders_bucketed", "customer_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    Tables.orders(spark, d)
      .write.mode("overwrite")
      .bucketBy(buckets, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bucketed")
    Tables.customer(spark, d)
      .withColumnRenamed("c_custkey", "o_custkey")
      .write.mode("overwrite")
      .bucketBy(buckets, "o_custkey").sortBy("o_custkey")
      .saveAsTable("customer_bucketed")
    spark.table("orders_bucketed")
      .join(spark.table("customer_bucketed"), "o_custkey")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("revenue"))
  }
}

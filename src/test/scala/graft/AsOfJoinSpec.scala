package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("as-of join picks the latest right row at or before each left time") {
    import spark.implicits._
    val probes = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 10L, ts("2024-01-01 09:00:00")), // before any order -> null
      (4L, 20L, ts("2024-01-01 12:00:00"))) // key with no orders -> null
      .toDF("event_id", "user_id", "ts")
    val orders = Seq(
      (100L, 10L, ts("2024-01-01 09:30:00")),
      (101L, 10L, ts("2024-01-01 11:00:00")),
      (102L, 10L, ts("2024-01-01 12:00:00")), // equal time: visible (<=)
      (103L, 30L, ts("2024-01-01 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")

    val got = AsOfJoin.asOf(
      probes, orders, "user_id", "o_custkey", "ts", "o_orderdate",
      "o_orderkey", Seq("o_orderkey"))
      .select("event_id", "o_orderkey")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    assert(got == Map(
      1L -> Some(100L), // 09:30 is latest <= 10:00
      2L -> Some(102L), // equal-time order visible
      3L -> None,
      4L -> None))
  }

  test("equal-time right rows resolve to the max tiebreak deterministically") {
    import spark.implicits._
    val probes = Seq((1L, 5L, ts("2024-06-01 00:00:00"))).toDF("event_id", "user_id", "ts")
    val orders = Seq(
      (7L, 5L, ts("2024-05-01 00:00:00")),
      (9L, 5L, ts("2024-05-01 00:00:00")),
      (8L, 5L, ts("2024-05-01 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val got = AsOfJoin.asOf(
      probes, orders, "user_id", "o_custkey", "ts", "o_orderdate",
      "o_orderkey", Seq("o_orderkey")).collect()
    assert(got.length == 1 && got(0).getLong(got(0).fieldIndex("o_orderkey")) == 9L)
  }

  test("string keys join on native type (no silent long cast)") {
    import spark.implicits._
    val probes = Seq((1L, "alpha", ts("2024-01-01 10:00:00")),
                     (2L, "beta", ts("2024-01-01 10:00:00")))
      .toDF("event_id", "k", "ts")
    val rights = Seq((100L, "alpha", ts("2024-01-01 09:00:00")),
                     (200L, "beta", ts("2024-01-01 09:30:00")))
      .toDF("rid", "k", "rt")
    val got = AsOfJoin.asOf(probes, rights, "k", "k", "ts", "rt", "rid", Seq("rid"))
      .select("event_id", "rid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // A long-cast key would null both keys and merge the groups; native
    // string partitioning must keep alpha/beta separate.
    assert(got == Map(1L -> 100L, 2L -> 200L))
  }

  test("incompatible key dtypes fail fast instead of silently nulling") {
    import spark.implicits._
    val l = Seq((1L, "x", ts("2024-01-01 00:00:00"))).toDF("event_id", "k", "ts")
    val r = Seq((9L, 5L, ts("2024-01-01 00:00:00"))).toDF("rid", "k", "rt")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l, r, "k", "k", "ts", "rt", "rid", Seq("rid"))
    }
  }

  test("plan shape: one shuffle on the key, no join explosion") {
    val df = AsOfJoin.q16.fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected window-based as-of plan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must not fall back to a product join:\n$plan")
  }
}

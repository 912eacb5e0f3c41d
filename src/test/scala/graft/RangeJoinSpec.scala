package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("proximity pairs == naive inequality join on generated data") {
    import spark.implicits._
    // Deterministic pseudo-random timestamps over ~2 hours, including
    // exact-radius boundary gaps and same-bucket clusters.
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val events = (0L until 300L)
      .map(i => (i, new Timestamp(base + (i * 2654435761L) % 7200000L)))
      .toDF("event_id", "ts")
    val r = 60L * 1000000L // 60 s

    val got = RangeJoin.proximityPairs(events, "event_id", "ts", r)
      .select("a", "b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet

    val e2 = events.select(col("event_id").as("b"), col("ts").as("ts2"))
    val naive = events.join(e2, col("event_id") < col("b") &&
        abs(unix_micros(col("ts")) - unix_micros(col("ts2"))) <= r)
      .select("event_id", "b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet

    assert(got == naive, s"missing=${naive -- got} extra=${got -- naive}")
    // Each qualifying pair must surface exactly once (no distinct in the plan).
    val cnt = RangeJoin.proximityPairs(events, "event_id", "ts", r).count()
    assert(cnt == naive.size.toLong)
  }

  test("q17 plans as a shuffle equi-join on the bin — no product join") {
    val plan = RangeJoin.q17.fn(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must not plan a product:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"expected an equi-join on the bin:\n$plan")
  }

  test("point-in-interval == naive containment join") {
    import spark.implicits._
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val points = (0L until 200L)
      .map(i => (i, new Timestamp(base + (i * 7919L * 1000L) % 86400000L)))
      .toDF("pid", "pt")
    // Intervals of mixed lengths (some shorter, some longer than the bin).
    val ivs = (0L until 40L).map { i =>
      val lo = base + (i * 104729L * 1000L) % 86400000L
      (i, new Timestamp(lo), new Timestamp(lo + 600000L + (i % 7) * 1800000L))
    }.toDF("iid", "lo", "hi")

    val got = RangeJoin.pointInInterval(
      points, Seq("pid"), "pt", ivs, Seq("iid"), "lo", "hi",
      binWidthMicros = 1800L * 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val naive = points.join(ivs,
        unix_micros(col("pt")) >= unix_micros(col("lo")) &&
          unix_micros(col("pt")) <= unix_micros(col("hi")))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got == naive, s"missing=${naive -- got} extra=${got -- naive}")
  }
}

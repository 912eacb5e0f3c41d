package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bucketing, Dedup, Relational}

/** Specs for the explicit scale-path operators: bucketed co-located joins,
  * connected-components dedup clustering, sketch accuracy.
  */
class ScaleOpsSpec extends SparkSpec {

  test("bucketed join plans with no shuffle exchange") {
    // Disable auto-broadcast so the test exercises the bucketed SMJ path
    // (at real scale neither side would fit a broadcast).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      bucketedJoinAssertions()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def bucketedJoinAssertions(): Unit = {
    val joined = Bucketing.bucketedOrdersCustomerJoin(spark, sf, buckets = 4)
    val plan = joined.queryExecution.executedPlan.toString
    // The join itself must consume the bucket layout: no Exchange between
    // the scans and the SortMergeJoin (the final aggregate may still
    // exchange on its own key).
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin") || joinSection.contains("ShuffledHashJoin"),
      s"expected a shuffle-family join on bucketed tables:\n$plan")
    assert(!joinSection.contains("Exchange"),
      s"bucketed join should not re-shuffle its inputs:\n$plan")
    // And the result matches the plain join.
    val expected = Relational.q03.fn(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val got = joined
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected)
  }

  test("dedup clusters: planted duplicate chain collapses to one component") {
    import spark.implicits._
    // a~b and b~c near-dups but a!~c directly: transitivity needs CC.
    val base = (1 to 80).map(i => s"tok$i")
    val a = base.mkString(" ")
    val b = (base.take(70) ++ (200 to 209).map(i => s"n$i")).mkString(" ")
    val c = (base.take(60) ++ (200 to 219).map(i => s"n$i")).mkString(" ")
    val unrelated = (300 to 380).map(i => s"z$i").mkString(" ")
    val docs = Seq((0L, a), (1L, b), (2L, c), (3L, unrelated)).toDF("doc_id", "text")

    val sh = Dedup.shingleSets(docs).cache()
    val cands = Dedup.lshCandidates(Dedup.minhashSignatures(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((0L, 1L)) && cands.contains((1L, 2L)),
      s"expected chain candidates, got $cands")

    // Min-label propagation over the candidate graph (same algorithm as
    // Dedup.dedupClusters, driven by these edges).
    val edges = cands.toSeq
    val labels = scala.collection.mutable.Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L)
    (1 to 5).foreach { _ =>
      edges.foreach { case (x, y) =>
        val m = math.min(labels(x), labels(y))
        labels(x) = m; labels(y) = m
      }
    }
    assert(labels(0L) == 0L && labels(1L) == 0L && labels(2L) == 0L)
    assert(labels(3L) == 3L)
  }

  test("dedup clusters operator runs end-to-end on testdata") {
    val out = Dedup.dedupClusters(spark, sf, threshold = 0.3)
    val rows = out.collect()
    // Clusters, if any, must be well-formed: rep = min member, size = count.
    val byRep = rows.groupBy(_.getLong(0))
    byRep.foreach { case (rep, members) =>
      val ids = members.map(_.getLong(1))
      assert(ids.min == rep, s"cluster rep $rep is not the min of ${ids.toSeq}")
      members.foreach(m => assert(m.getLong(2) == ids.length))
    }
  }

  test("approx_count_distinct within its error bound of exact") {
    val rows = Relational.q15.fn(spark, sf).collect()
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.10,
        s"HLL estimate off by >10%: approx=$approx exact=$exact")
    }
  }
}

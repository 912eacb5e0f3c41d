package graft

/** Dev utility: one-line plan audit per inventory query — exchange / join
  * operator counts and cartesian-product detection, for spotting plans that
  * drifted from their intended shape. `runMain graft.PlanAudit [sfDir]`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.get("graft-plan-audit")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        def n(s: String) = s.r.findAllIn(plan).length
        val cartesian = if (plan.contains("CartesianProduct")) " CARTESIAN!" else ""
        val bnl = if (plan.contains("BroadcastNestedLoopJoin")) " BNLJ" else ""
        println(f"[audit] $name%-28s exch=${n("Exchange")}%2d smj=${n("SortMergeJoin")}%2d bhj=${n("BroadcastHashJoin")}%2d$cartesian$bnl")
      } catch {
        case e: Throwable => println(s"[audit] $name FAILED: ${e.getMessage.take(100)}")
      }
    }
    spark.stop()
  }
}

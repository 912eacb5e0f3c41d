package graft

/** Plan-inspection CLI: print the executed physical plan of one inventory
  * query — `runMain graft.PlanPeek <query_name> [sfDir]`. The quick way to
  * answer "how many scans / where are the exchanges" for a single query
  * without running the full PlanAudit sweep (which aggregates counts but
  * doesn't print trees). Used to catch q40's triple events scan.
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("plan-peek")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val df = SparkEntry.queries(args(0))(spark, sfDir)
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}

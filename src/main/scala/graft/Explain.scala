package graft

/** Dev utility: print the formatted physical plan and wall time of one
  * inventory query. `runMain graft.Explain <query_name> [sfDir]`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Explain <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-explain")
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
    val df = fn(spark, sfDir)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[explain] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
  }
}

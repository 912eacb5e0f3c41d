package graft

/** One-query timing CLI: `runMain graft.TimeOne <query> <sfDir> [count|noop]`.
  * The rehearsal mains time `count()`, which is right for shuffle/aggregate
  * plans but lets Catalyst prune a pure map-only projection down to a
  * parquet metadata scan — for those rows the honest measure is the noop
  * sink (Bench's convention: full materialization). This main exists to
  * cross-check exactly that distinction; min-of-2 like the rehearsals.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val mode = if (args.length > 2) args(2) else "noop"
    val spark = GraftSession.get("graft-time-one")
    val fn = SparkEntry.queries(name)
    def once(): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      if (mode == "count") fn(spark, dir).count()
      else fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val t = math.min(once(), once())
    println(f"[timeone] $name $mode $dir $t%.2f s")
    spark.stop()
  }
}

package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Plan-capture CLI for the optimization rounds:
  * `runMain graft.PlanDump <outDir> [sfDir] [query ...]` writes
  * `<outDir>/<query>.txt` with the `.explain("formatted")` output of each
  * named query (all 185 when none named) from ONE session, in inventory
  * order — the same order Bench runs, so memo-consumer plans are captured
  * in their steady (memo-hit) shape. Also prints a per-query summary line
  * (exchange / scan / sort counts) for quick triage.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(sys.error("usage: PlanDump <outDir> [sfDir] [query ...]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val only = args.drop(2).toSet
    Files.createDirectories(Paths.get(outDir))
    val spark = GraftSession.get("graft-plan-dump")
    val all = SparkEntry.queries.toSeq.sortBy(_._1)
    // Queries sorting after the last requested name cannot influence any
    // captured plan (memos build in name order) — don't run them.
    val sorted =
      if (only.isEmpty) all
      else all.takeWhile(_._1 <= only.max)
    sorted.foreach { case (name, fn) =>
      val wanted = only.isEmpty || only.contains(name)
      try {
        val df = fn(spark, sfDir)
        if (wanted) {
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.write(Paths.get(outDir, s"$name.txt"),
            txt.getBytes(StandardCharsets.UTF_8))
          def n(p: String) = p.r.findAllIn(txt).length
          println(f"[plandump] $name%-32s exch=${n("Exchange")}%2d " +
            f"scan=${n("Scan parquet")}%2d sort=${n("\\bSort\\b")}%2d " +
            f"smj=${n("SortMergeJoin")}%2d bhj=${n("BroadcastHashJoin")}%2d")
        } else
          // Still EXECUTE skipped queries so session memos build in Bench
          // order and later plans are captured memo-hit shaped.
          df.write.format("noop").mode("overwrite").save()
      } catch {
        case e: Throwable => System.err.println(s"[plandump] $name: $e")
      }
    }
    spark.stop()
  }
}

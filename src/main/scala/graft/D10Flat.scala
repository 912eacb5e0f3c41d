package graft

import org.apache.spark.sql.functions._

/** Dev main (feeds PLANS.md): the d10 residual-wall measurement the
  * round-15 verdict asked for — "prove the ~5 s is constant in data size
  * instead of folding further". d10's bipartite incremental gate is
  * delta-sided by construction (every join keys off the wave, the corpus
  * never reshuffles); after the round-15 orchestration fold its wall is
  * dominated by ~42 AQE stage-scheduling futures at ~0.1 s each —
  * data-INDEPENDENT driver overhead, benign on a real cluster where the
  * same stages overlap executor work. If that attribution is right, the
  * wall is ~flat from sf0.01 through a 10× sf0.1 rehearsal corpus (a
  * 100× document range); if it grows with corpus size, more folding is
  * warranted. `runMain graft.D10Flat [sfDir]` — measures sf0.01, sfDir,
  * and a 10× scale-up of sfDir.
  */
object D10Flat {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-d10-flat")
    // Cache keyed on the source dir's CONTENT STAMP (the memo-key
    // ingredient, not a path hash): a rerun against a different sfDir OR
    // a regenerated corpus at the same path must not silently measure a
    // stale scaled copy.
    val tenX = "target/d10flat-10x-" +
      java.lang.Long.toHexString(MemoLedger.dirStamp(sfDir))
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$tenX/documents.parquet"))) {
      ScaleRehearsal.scaledDocs(
        spark.read.parquet(s"$sfDir/documents.parquet"), 10)
        .write.mode("overwrite").parquet(s"$tenX/documents.parquet")
    }
    def minOf2(f: => Long): (Double, Long) = {
      def once(): (Double, Long) = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (tA, rows) = once(); val (tB, _) = once()
      (math.min(tA, tB), rows)
    }
    val fn = SparkEntry.queries("d10_incremental_keep")
    println(f"[d10flat] ${"corpus"}%-22s ${"docs"}%8s ${"wall_s"}%7s")
    Seq("/root/testdata/sf0.01" -> "sf0.01", sfDir -> "sf0.1", tenX -> "10x-sf0.1")
      .foreach { case (dir, tag) =>
        // Memoized resident artifacts are per-corpus: clear between
        // corpora so each row pays its own full gate (the honest wall).
        graft.operators.Dedup.clearCorpusMemo()
        val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
        val (t, _) = minOf2(fn(spark, dir).count())
        println(f"[d10flat] $tag%-22s $nDocs%8d $t%7.2f")
      }
    spark.stop()
  }
}

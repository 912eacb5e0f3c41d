package graft

/** Same-session A/B probe for the presentation-sort seam:
  * `runMain graft.SortProbe [sfDir]` times each Present-converted probe
  * query with the trailing global sort ON vs OFF (noop sink, min of 3,
  * interleaved so ambient drift hits both arms equally).
  */
object SortProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-sort-probe")
    val names = Seq("q01_scan_filter_project", "d01_dedup_exact",
      "t27_dsir_importance", "t38_sentence_profile")
    def once(name: String): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // Warmup both shapes (codegen cache).
    names.foreach { n =>
      Present.enabled = true; once(n)
      Present.enabled = false; once(n)
    }
    names.foreach { n =>
      val on = scala.collection.mutable.ArrayBuffer.empty[Double]
      val off = scala.collection.mutable.ArrayBuffer.empty[Double]
      for (_ <- 1 to 3) {
        Present.enabled = true; on += once(n)
        Present.enabled = false; off += once(n)
      }
      println(f"[sortprobe] $n%-28s sortON=${on.min}%.3f sortOFF=${off.min}%.3f " +
        f"delta=${on.min - off.min}%+.3f")
    }
    spark.stop()
  }
}

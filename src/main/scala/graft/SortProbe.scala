package graft

/** Same-session A/B probe for the presentation-sort seam:
  * `runMain graft.SortProbe [sfDir]` times each Present-converted probe
  * query with the trailing global sort ON vs OFF (noop sink, min of 3,
  * interleaved so ambient drift hits both arms equally).
  */
object SortProbe {
  def main(args: Array[String]): Unit = {
    val sfDir0 = args.filterNot(_.startsWith("--")).headOption
      .getOrElse("/root/testdata/sf0.1")
    val scale10 = args.contains("--scale10")
    val spark = GraftSession.get("graft-sort-probe")
    // --scale10: probe on a 10× documents corpus (D10Flat's stamp-keyed
    // cache pattern) — evidence that the presentation-sort win GROWS
    // with data (the range exchange + sort are output-proportional),
    // i.e. the optimization is not a small-SF artifact. Only
    // documents-backed probe queries run in this mode.
    val sfDir =
      if (!scale10) sfDir0
      else {
        val tenX = "target/sortprobe-10x-" +
          java.lang.Long.toHexString(MemoLedger.dirStamp(sfDir0))
        if (!java.nio.file.Files.exists(
            java.nio.file.Paths.get(s"$tenX/documents.parquet")))
          ScaleRehearsal.scaledDocs(
            spark.read.parquet(s"$sfDir0/documents.parquet"), 10)
            .write.mode("overwrite").parquet(s"$tenX/documents.parquet")
        tenX
      }
    val names =
      if (scale10) Seq("d01_dedup_exact", "t27_dsir_importance",
        "t38_sentence_profile")
      else Seq("q01_scan_filter_project", "d01_dedup_exact",
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

package graft

/** Throwaway profiling main (dev only): time named inventory queries twice
  * each (warm second run) without the full bench. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("d02_dedup_minhash_lsh", "d03_dedup_simhash", "d04_ngram_jaccard", "d06_dedup_clusters")
    val spark = GraftSession.get("graft-scratch")
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to 2).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        println(f"[scratch] $n run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}

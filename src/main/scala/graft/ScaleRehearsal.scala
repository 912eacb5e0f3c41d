package graft

import org.apache.spark.sql.functions._

/** Scale rehearsal (dev main, feeds SCALE.md): the closest local[32] proxy
  * for the "would this still work at 100×?" question — build a ~10× corpus
  * from sf0.1's documents and compare the dedup family's wall time against
  * the 1× baseline.
  *
  * Corpus construction: 10 copies of the 5k-doc sf0.1 documents table,
  * copy i offset in doc_id space and every whitespace token suffixed with
  * a copy tag (`$1xi`). The tagging makes copies mutually shingle-disjoint
  * (so candidate structure does not explode combinatorially — that would
  * be a different, dup-flooded workload) while REPLICATING each copy's
  * internal duplicate/near-dup structure, so dup groups, LSH candidates,
  * and verify pairs all scale ~linearly with the corpus — the regime the
  * 100 TB design assumes (healthy data, bounded dup rate).
  *
  * Reported per query: min-of-2 wall at 1× and 10×, the ratio, and the
  * output row counts (which must scale ~10× for the dup-family queries).
  * A ratio well under ~10 on equal per-row work means fixed per-job
  * overhead still dominates at sf0.1 — the scale-friendly direction.
  *
  * `runMain graft.ScaleRehearsal [sfDir] [outDir] [k]`
  */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "target/scale10x"
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.get("graft-scale-rehearsal")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val copies = (0 until k).map { i =>
      if (i == 0) docs
      else docs.select(
        (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", "$1x" + i).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
    copies.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val n1 = docs.count()
    val nK = spark.read.parquet(s"$outDir/documents.parquet").count()
    println(s"[scale] corpus: ${n1} docs at 1x -> ${nK} docs at ${k}x ($outDir)")

    val names = Seq("d02_dedup_minhash_lsh", "d06_dedup_clusters",
      "d07_dedup_keep_list", "d10_incremental_keep")
    def timeQuery(name: String, dir: String): (Double, Long) = {
      val fn = SparkEntry.queries(name)
      def once(): (Double, Long) = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val rows = fn(spark, dir).count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (tA, rows) = once()
      val (tB, _) = once()
      (math.min(tA, tB), rows)
    }
    println(f"[scale] ${"query"}%-26s ${"1x sec"}%8s ${"rows"}%8s ${k + "x sec"}%8s ${"rows"}%9s ratio")
    names.foreach { name =>
      val (t1, r1) = timeQuery(name, sfDir)
      val (tK, rK) = timeQuery(name, outDir)
      println(f"[scale] $name%-26s $t1%8.2f $r1%8d $tK%8.2f $rK%9d ${tK / t1}%5.1fx")
    }
    spark.stop()
  }
}

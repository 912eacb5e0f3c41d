package graft

import graft.operators.Dedup
import graft.sources.Tables

/** Throwaway profiling main (dev only). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-scratch")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = Tables.documents(spark, d)
    time("shingleSets.count") { println(Dedup.shingleSets(docs).count()) }
    val sigs = time("signatures") { val s = Dedup.minhashSignatures(docs).cache(); println(s.count()); s }
    time("lshCandidates.count") { println(Dedup.lshCandidates(sigs).count()) }
    time("full minhashPairs") { println(Dedup.minhashPairs(spark, d, 0.5).count()) }
    spark.stop()
  }
}

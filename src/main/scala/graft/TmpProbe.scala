package graft
import org.apache.spark.sql.functions._
import graft.operators._
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("probe")
    val media = Multimodal.mediaTable(spark, "target/scale100x")
    val sigs = Multimodal.mediaSignatures(media)
    println(s"[probe] docs=${sigs.count()} distinct_sigs=${sigs.select("ph").distinct().count()}")
    val pairs = Multimodal.mediaNeardupPairs(media, 14)
    println(s"[probe] pairs=${pairs.count()}")
    val h = pairs.groupBy("hamming").count().orderBy("hamming").collect()
    h.foreach(r => println(s"[probe] hamming=${r.get(0)} n=${r.get(1)}"))
    spark.stop()
  }
}

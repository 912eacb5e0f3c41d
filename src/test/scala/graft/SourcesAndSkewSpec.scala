package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, SkewJoin}
import graft.sources.TextSource

class SourcesAndSkewSpec extends SparkSpec {

  test("TextSource: sorted file listing, line attribution, first-tab KV split") {
    val dir = Files.createTempDirectory("graft-text").toFile
    Files.write(new java.io.File(dir, "b_file").toPath, "k1\tv1\textra\n\nplain\n".getBytes)
    Files.write(new java.io.File(dir, "a_file").toPath, "k2\tv2\n".getBytes)
    assert(TextSource.files(dir.getAbsolutePath) == Seq("a_file", "b_file"))

    val kv = TextSource.kv(TextSource.readLines(spark, dir.getAbsolutePath))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // Tabs in values preserved; blank line -> empty key; no-tab line -> whole
    // line as key with empty value (reference partition("\t") semantics).
    assert(kv == Set(("k1", "v1\textra"), ("k2", "v2"), ("", ""), ("plain", "")))
  }

  test("TextSource: write/read round trip") {
    val out = Files.createTempDirectory("graft-text-out").toFile.getAbsolutePath + "/sink"
    import spark.implicits._
    TextSource.write(Seq("x\t1", "y\t2").toDF("value"), out)
    val back = spark.read.text(out).collect().map(_.getString(0)).toSet
    assert(back == Set("x\t1", "y\t2"))
  }

  test("salted join == plain join on skewed data") {
    import spark.implicits._
    // 90% of rows share one hot key.
    val large = spark.range(0, 20000)
      .select(
        when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id") % 100).as("k"),
        col("id").as("payload"))
    val small = Seq((0L, "zero"), (1L, "one"), (42L, "forty-two")).toDF("k", "name")
    val expected = large.join(small, Seq("k"))
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    val got = SkewJoin.saltedJoin(large, small, "k", 8)
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("IVF ANN: ranks valid and recall reasonable vs exact") {
    val exact = Similarity.bruteForceTopK(spark, sf, 10, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Similarity.ivfTopK(spark, sf, 10, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = exact.count { case (q, n) => ivf.get(q).contains(n) }
    // nProbe=4 of 16 cells: expect well above the 25% random-probe floor.
    assert(hits >= 4, s"IVF recall too low: $hits/10 (exact=$exact ivf=$ivf)")
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Source/sink format coverage beyond parquet and text: CSV and JSON lines
  * round trips with explicit schemas (schema-on-read, no inference jobs —
  * at scale inference is a full extra pass).
  */
class FormatsSpec extends SparkSpec {

  test("csv round trip with explicit schema") {
    val out = Files.createTempDirectory("graft-fmt").toFile.getAbsolutePath + "/csv"
    val src = Tables.nation(spark, sf)
    src.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.schema(src.schema).option("header", "true").csv(out)
    assert(back.collect().map(_.toSeq).toSet == src.collect().map(_.toSeq).toSet)
  }

  test("json lines round trip with explicit schema") {
    val out = Files.createTempDirectory("graft-fmt").toFile.getAbsolutePath + "/json"
    val src = Tables.region(spark, sf)
    src.write.mode("overwrite").json(out)
    val back = spark.read.schema(src.schema).json(out)
    assert(back.collect().map(_.toSeq).toSet == src.collect().map(_.toSeq).toSet)
  }
}

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

  test("orc round trip preserves values and types (columnar alternative to parquet)") {
    val out = Files.createTempDirectory("graft-fmt").toFile.getAbsolutePath + "/orc"
    val src = Tables.customer(spark, sf)
    src.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.schema == src.schema)
    assert(back.collect().map(_.toSeq).toSet == src.collect().map(_.toSeq).toSet)
    // Predicate pushdown works on the ORC scan too.
    val plan = back.filter(col("c_acctbal") > 0).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("c_acctbal"),
      s"no pushdown on ORC scan:\n$plan")
  }

  test("JsonLines: gzip'd corpus round trip preserves every document") {
    import graft.sources.JsonLines
    val out = Files.createTempDirectory("graft-fmt").toFile.getAbsolutePath + "/jsonl-gz"
    val src = Tables.documents(spark, sf)
    JsonLines.write(src, out, codec = Some("gzip"))
    assert(new java.io.File(out).listFiles().exists(_.getName.endsWith(".json.gz")),
      "expected gzip'd part files")
    val back = JsonLines.readValid(spark, out, src.schema)
    assert(back.schema == src.schema)
    assert(back.collect().map(_.toSeq).toSet == src.collect().map(_.toSeq).toSet)
  }

  test("events.ts normalizes to TIMESTAMP under all three parquet encodings") {
    // The harness testdata has shipped events.ts as TIMESTAMP(NANOS)
    // (surfaced as long under nanosAsLong), micros-NTZ (no isAdjustedToUTC
    // flag), and micros-UTC across rounds. The Tables boundary must yield
    // TimestampType with identical values for every encoding.
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val micros = 1705322096789012L // 2024-01-15 12:34:56.789012 UTC
    def eventsDir(suffix: String): String =
      Files.createTempDirectory(s"graft-ts-$suffix").toFile.getAbsolutePath

    // (a) nanos-as-long: the legacy conf surfaces TIMESTAMP(NANOS) as a
    // long column; sub-microsecond digits truncate.
    val dNanos = eventsDir("nanos")
    spark.range(1).select(lit(micros * 1000L + 345L).as("ts"), lit(7L).as("user_id"))
      .write.mode("overwrite").parquet(s"$dNanos/events.parquet")
    // (b) micros-NTZ: what Spark 4's inferTimestampNTZ would read as
    // TIMESTAMP_NTZ (we disable the inference; the schema walk is the
    // belt-and-braces for sessions that don't).
    val dNtz = eventsDir("ntz")
    spark.range(1)
      .select(expr(s"to_timestamp_ntz(timestamp_micros(${micros}L))").as("ts"),
        lit(7L).as("user_id"))
      .write.mode("overwrite").parquet(s"$dNtz/events.parquet")
    // (c) micros-UTC: the unambiguous encoding.
    val dUtc = eventsDir("utc")
    spark.range(1).select(expr(s"timestamp_micros(${micros}L)").as("ts"), lit(7L).as("user_id"))
      .write.mode("overwrite").parquet(s"$dUtc/events.parquet")

    val read = Seq(dNanos, dNtz, dUtc).map { d =>
      val ev = Tables.events(spark, d)
      assert(ev.schema("ts").dataType == TimestampType,
        s"$d: expected TIMESTAMP, got ${ev.schema("ts").dataType}")
      ev.select(unix_micros(col("ts"))).collect().head.getLong(0)
    }
    assert(read.toSet == Set(micros), s"encodings disagree on the value: $read")

    // normalizeTimestamps itself handles a live NTZ column (the path taken
    // when inferTimestampNTZ is enabled) and leaves others untouched.
    val ntzDf = spark.range(1)
      .select(expr(s"to_timestamp_ntz(timestamp_micros(${micros}L))").as("ts"),
        lit("x").as("tag"))
    assert(ntzDf.schema("ts").dataType == TimestampNTZType)
    val norm = Tables.normalizeTimestamps(ntzDf)
    assert(norm.schema("ts").dataType == TimestampType)
    assert(norm.select(unix_micros(col("ts"))).collect().head.getLong(0) == micros)
    assert(norm.schema("tag") == ntzDf.schema("tag"))
  }

  test("JsonLines: malformed lines are quarantined, not dropped or fatal") {
    import graft.sources.JsonLines
    val dir = Files.createTempDirectory("graft-fmt-corrupt").toFile
    Files.write(new java.io.File(dir, "part-00000.json").toPath,
      """{"doc_id": 1, "text": "good"}
        |this is not json at all
        |{"doc_id": 2, "text": "also good"}
        |{"doc_id": oops}
        |""".stripMargin.getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val valid = JsonLines.readValid(spark, dir.getAbsolutePath, schema)
    assert(valid.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val corrupt = JsonLines.readCorrupt(spark, dir.getAbsolutePath, schema)
      .collect().map(_.getAs[String](JsonLines.CorruptCol))
    assert(corrupt.length == 2, s"expected 2 quarantined lines, got ${corrupt.toSeq}")
    assert(corrupt.contains("this is not json at all"), "corrupt line not verbatim")
  }
}

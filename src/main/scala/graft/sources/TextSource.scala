package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Line-oriented text-directory source — the reference's fundamental data
  * model (SURVEY.md §1: a dataset is a directory of UTF-8 text files;
  * records are lines; KV records are `key \t value` with the key before the
  * FIRST tab — reference `mapreduce/worker/__main__.py:182-183`).
  *
  * Spark's file source does the reference Manager's file enumeration
  * (`manager/__main__.py:320-327`, sorted regular files) with distributed
  * split packing on top; `files()` exposes the same sorted listing for
  * callers that need the reference's deterministic file order.
  */
object TextSource {

  /** Sorted regular files of a directory — the reference's input listing. */
  def files(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.isFile).map(_.getName).sorted.toSeq
  }

  /** All lines with their source file (deterministic attribution). */
  def readLines(spark: SparkSession, dir: String): DataFrame =
    spark.read.text(dir)
      .select(input_file_name().as("file"), col("value").as("line"))

  /** Tab-KV view of a line dataset: key = text before the first tab, value =
    * the remainder (tabs in values preserved — `split(.., 2)`). Blank lines
    * yield an empty key with empty value, matching the reference's
    * empty-key data semantics. */
  def kv(lines: DataFrame): DataFrame =
    lines.select(
      substring_index(col("line"), "\t", 1).as("key"),
      when(instr(col("line"), "\t") > 0,
        expr("substring(line, instr(line, '\t') + 1)")).otherwise(lit("")).as("value"))

  /** Overwrite-mode text sink, `part-NNNNN`-style files, one per partition
    * (reference `worker/__main__.py:237-250` output contract). */
  def write(df: DataFrame, outDir: String): Unit =
    df.write.mode("overwrite").text(outDir)
}

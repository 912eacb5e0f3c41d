package graft.sources

import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JSON-Lines corpus interchange — the de-facto landing format of text
  * training corpora (one JSON document per line, newline-delimited,
  * optionally gzip'd per file).
  *
  * Design rules for 100 TB corpora:
  *  - **Always pass an explicit schema on read.** Schema inference is a
  *    full extra pass over the data (and infers wrong types on sparse
  *    fields); a corpus contract is a schema, not a guess.
  *  - **PERMISSIVE mode with a captured corrupt-record column.** At corpus
  *    scale malformed lines are a certainty; failing the job on line 40
  *    billion is not an option, silently dropping them is not auditable.
  *    Corrupt rows surface as data (`_corrupt_record`) for a quarantine
  *    sink.
  *  - Compression is a per-file codec (gzip/zstd): splittability is lost
  *    per file, so corpora land as many moderate files — which is how the
  *    writer below emits them (one file per partition).
  */
object JsonLines {

  val CorruptCol = "_corrupt_record"

  /** Read a JSONL directory with a mandatory schema contract; malformed
    * lines are captured in [[CorruptCol]] instead of failing or vanishing. */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(dir)

  /** Valid rows only (corrupt column null), with the contract schema. */
  def readValid(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    read(spark, dir, schema)
      .filter(org.apache.spark.sql.functions.col(CorruptCol).isNull)
      .drop(CorruptCol)

  /** Malformed rows — the quarantine stream: the verbatim line in
    * [[CorruptCol]] alongside the (null) contract columns. The full row is
    * returned deliberately: Spark refuses scans whose referenced columns
    * are ONLY the internal corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN
    * — column pruning would otherwise skip the parse that populates it), so
    * project after materializing if only the raw text is wanted. */
  def readCorrupt(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    read(spark, dir, schema)
      .filter(org.apache.spark.sql.functions.col(CorruptCol).isNotNull)

  /** Write a DataFrame as JSONL, optionally compressed (codec = "gzip",
    * "zstd", …); one file per partition, overwrite semantics matching the
    * reference's output-directory contract. */
  def write(df: DataFrame, outDir: String, codec: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    codec.fold(w)(c => w.option("compression", c)).json(outDir)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Canonical-composition normalization is the first transform of every text
  * ingestion pipeline (mixed-provenance corpora carry the same glyph as
  * precomposed U+00E9 and decomposed e+U+0301; dedup/fingerprint/tokenize
  * all diverge unless the forms are unified first). Spark has no built-in
  * normalizer, so the composable route is a Scala UDF — opaque to Catalyst
  * and boxing per row. This expression runs `java.text.Normalizer` (the
  * JDK's UAX #15 implementation) inside whole-stage codegen via a static
  * helper, with an ASCII fast path: a pure-ASCII string (the overwhelming
  * common case in web corpora) is returned UNCHANGED without entering the
  * normalizer — no allocation, one byte scan.
  *
  * The DuckDB oracle's `nfc_normalize` (utf8proc) implements the same
  * UAX #15 algorithm, so the t26 query hash-matches across engines; the
  * non-ASCII behavior (NFD → NFC composition, compatibility codepoints
  * left alone) is spec-asserted on planted strings, since the test corpus
  * itself is ASCII.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nfc_norm requires STRING, got $t")
  }
  override def nullSafeEval(v: Any): Any =
    NfcNormalize.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
  override def prettyName: String = "nfc_norm"
}

object NfcNormalize {
  /** Static so generated code can call it. ASCII bytes are all < 0x80 and
    * NFC-invariant, so the fast path returns the input object itself. */
  def compute(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) {
        val str = s.toString
        val norm = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
        return if (norm == str) s else UTF8String.fromString(norm)
      }
      i += 1
    }
    s
  }
}

/** 37-bin symbol histogram over a string's ASCII [a-z0-9 ] characters —
  * m13's entropy alphabet, counted in ONE byte scan inside whole-stage
  * codegen. The composable form (`split` → per-char `explode` → a
  * (doc, symbol)-keyed aggregate) materializes a row PER PAYLOAD BYTE —
  * the m13/m14 doc-wave profile measured that leg at ~16 s of the 100×
  * corpus's wall (250M symbol rows through a shuffle whose output is ≤ 37
  * rows per doc). This expression returns the 37 counts directly
  * (index 0–25 = 'a'–'z', 26–35 = '0'–'9', 36 = space), so the entropy
  * rollup becomes map-side higher-order-function arithmetic over a
  * fixed-width array: no explode, no symbol shuffle, no join-back.
  *
  * Byte-scan correctness on UTF-8: the counted chars are single-byte
  * ASCII, and UTF-8 continuation/lead bytes of multi-byte characters are
  * ≥ 0x80 (negative as signed bytes), so a byte match IS a character
  * match — identical counts to the per-character regex filter. Callers
  * pass `lower(...)` input, keeping Unicode lowercasing (the engine-
  * parity contract with the oracle's `lower()`) outside the expression.
  */
case class AsciiSymHist(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ascii_sym_hist requires STRING, got $t")
  }
  override def nullSafeEval(v: Any): Any =
    AsciiSymHist.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AsciiSymHist.compute($c)")
  override protected def withNewChildInternal(c: Expression): AsciiSymHist =
    copy(child = c)
  override def prettyName: String = "ascii_sym_hist"
}

object AsciiSymHist {
  /** Static so generated code can call it. */
  def compute(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val h = new Array[Long](37)
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      val c = s.getByte(i)
      if (c >= 'a' && c <= 'z') h(c - 'a') += 1
      else if (c >= '0' && c <= '9') h(26 + (c - '0')) += 1
      else if (c == ' ') h(36) += 1
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(h)
  }
}

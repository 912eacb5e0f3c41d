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

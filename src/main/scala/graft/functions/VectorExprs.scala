package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two array<float|double> columns, with codegen.
  *
  * The composable form (`zip_with` + `aggregate` higher-order functions)
  * evaluates interpreted — Spark's HOF lambdas never enter whole-stage
  * codegen, and each row allocates an intermediate product array. This
  * expression runs the multiply-accumulate loop as generated Java inside
  * the scan stage: no intermediate array, no boxing, SIMD-friendly.
  *
  * Semantics exactly match the HOF form so swapping it in cannot move any
  * oracle-checked result: double-precision sequential left-fold in element
  * order (bit-identical to DuckDB's `list_dot_product` accumulation), and
  * NULL when either input is NULL, lengths differ, or any element is NULL
  * (`zip_with` pads/propagates nulls the same way).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two ARRAY<FLOAT|DOUBLE> args, got ${left.dataType} and ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      def get(arr: String, e: Expression) =
        if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
        |int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $sum = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    $sum += ${get(a, left)} * ${get(b, right)};
        |  }
        |  if (!${ev.isNull}) ${ev.value} = $sum;
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** Symmetric int8 (scalar) quantization round-trip error of one embedding:
  * `[mae, rmse]` of `x − dequant(quant(x))` with per-vector scale
  * `max|x| / 127` — the storage-compression readout every vector index
  * makes before switching to int8 (4× smaller, how much recall risk).
  *
  * One codegen'd pass per vector (same static-helper pattern as
  * [[RollingMinHash]]); portable arithmetic only (`floor(x/s + 0.5)` is
  * round-half-up in every engine — no Java-vs-C round() divergence), so the
  * DuckDB oracle reproduces it bit-for-bit with list lambdas. NULL for
  * empty/zero vectors (nothing to quantize — the oracle filters the same).
  */
case class Sq8Error(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"sq8_err requires ARRAY<FLOAT|DOUBLE>, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    Sq8Error.compute(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("sq8")
    nullSafeCodeGen(ctx, ev, c => s"""
      |org.apache.spark.sql.catalyst.util.ArrayData $res =
      |  graft.functions.Sq8Error.compute($c, $isFloat);
      |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
    """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Sq8Error = copy(child = c)
  override def prettyName: String = "sq8_err"
}

/** Mean squared byte value of a string's UTF-8 bytes — the audio-style
  * frame-energy kernel (sum b² / n over a window's samples). One codegen'd
  * pass over the window bytes; the accumulator is exact (long — 32 samples
  * of b² ≤ 65025 can't overflow), so the final double division is
  * bit-identical to any engine that sums integers first (the DuckDB
  * oracle does). NULL for the empty string (no samples).
  */
case class ByteEnergy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"byte_energy requires STRING, got $t")
  }
  override def nullSafeEval(v: Any): Any =
    ByteEnergy.compute(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |Double ${ev.value}Box = graft.functions.ByteEnergy.compute($c);
      |if (${ev.value}Box == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ${ev.value}Box.doubleValue(); }
    """.stripMargin)
  override protected def withNewChildInternal(c: Expression): ByteEnergy = copy(child = c)
  override def prettyName: String = "byte_energy"
}

object ByteEnergy {
  /** Boxed so generated code can branch on null; static for codegen. */
  def compute(s: org.apache.spark.unsafe.types.UTF8String): java.lang.Double = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return null
    var sum = 0L
    var i = 0
    while (i < n) { val b = bytes(i) & 0xff; sum += b.toLong * b; i += 1 }
    java.lang.Double.valueOf(sum.toDouble / n)
  }
}

object Sq8Error {
  /** Returns `[mae, rmse]`, or null for empty / all-zero / null-element
    * vectors. Static so generated code can call it. */
  def compute(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    if (n == 0) return null
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val ax = math.abs(x)
      if (ax > maxAbs) maxAbs = ax
      i += 1
    }
    val scale = maxAbs / 127.0
    if (scale == 0.0) return null
    var sumAbs = 0.0
    var sumSq = 0.0
    i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val r = x - math.floor(x / scale + 0.5) * scale
      sumAbs += math.abs(r)
      sumSq += r * r
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(sumAbs / n, math.sqrt(sumSq / n)))
  }
}

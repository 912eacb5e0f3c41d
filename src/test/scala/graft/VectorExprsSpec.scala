package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Native vec_dot expression: bit-parity with the HOF formulation it
  * replaced, null semantics, and mixed float/double element types. */
class VectorExprsSpec extends SparkSpec {

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  test("vec_dot is bit-identical to the zip_with/aggregate fold on real embeddings") {
    val e = graft.sources.Tables.embeddings(spark, sf).limit(200)
    val cmp = e.select(
      VectorFns.dot(col("embedding"), col("embedding")).as("native"),
      hofDot(col("embedding"), col("embedding")).as("hof"))
    assert(cmp.filter(col("native") =!= col("hof")).count() == 0)
    assert(cmp.filter(col("native").isNull).count() == 0)
  }

  test("vec_dot: mixed float/double operands and literal arrays") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f))).toDF("v")
    val plane = array(lit(2.0), lit(-1.0), lit(0.5))
    val got = df.select(VectorFns.dot(col("v"), plane)).collect()(0).getDouble(0)
    assert(got == 1.0 * 2.0 + 2.0 * -1.0 + 3.0 * 0.5)
  }

  test("vec_dot null semantics: null input, length mismatch, null element") {
    val rows = spark.sql(
      """SELECT
        |  vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS null_in,
        |  vec_dot(array(1.0d, 2.0d), array(1.0d)) AS len_mismatch,
        |  vec_dot(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS null_elem,
        |  vec_dot(array(CAST(1.5 AS FLOAT)), array(2.0d)) AS mixed
        |""".stripMargin).collect()(0)
    assert(rows.isNullAt(0) && rows.isNullAt(1) && rows.isNullAt(2))
    assert(rows.getDouble(3) == 3.0)
  }

  test("sq8_err: hand-computed example, zero/empty/null semantics") {
    // v = [1.0, -0.5, 127-quantile exact]: scale = 1.0/127; values that are
    // exact multiples of the scale round-trip with zero error.
    val r = spark.sql(
      """SELECT
        |  sq8_err(array(CAST(1.0 AS DOUBLE), CAST(-0.5 AS DOUBLE))) AS e1,
        |  sq8_err(array(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE))) AS zeros,
        |  sq8_err(CAST(array() AS ARRAY<DOUBLE>)) AS empty,
        |  sq8_err(CAST(NULL AS ARRAY<DOUBLE>)) AS null_in
        |""".stripMargin).collect()(0)
    val e1 = r.getSeq[Double](0)
    // scale = 1/127; 1.0 = 127*scale exactly, -0.5 = -63.5*scale rounds to
    // -64*scale (floor(-63.5+0.5) = -63 … check against a direct recompute).
    val scale = 1.0 / 127.0
    def resid(x: Double) = x - math.floor(x / scale + 0.5) * scale
    val exp = Seq(1.0, -0.5).map(resid)
    val mae = exp.map(math.abs).sum / 2
    val rmse = math.sqrt(exp.map(x => x * x).sum / 2)
    assert(e1 == Seq(mae, rmse), s"got $e1, want ${Seq(mae, rmse)}")
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("sq8_err: error bounded by half a quantization step on real embeddings") {
    val e = graft.sources.Tables.embeddings(spark, sf).limit(200)
    val rows = e.select(
        expr("sq8_err(embedding)").as("err"),
        aggregate(transform(col("embedding"), x => abs(x.cast("double"))),
          lit(0.0), (a, v) => greatest(a, v)).as("maxabs"))
      .filter(col("err").isNotNull)
      .filter(col("err")(0) > col("maxabs") / 127.0 / 2.0 + lit(1e-12))
      .count()
    assert(rows == 0, "mean abs error exceeded half a quantization step")
  }

  test("cosine via vec_dot matches oracle-checked s01 semantics (self-similarity 1.0)") {
    val e = graft.sources.Tables.embeddings(spark, sf).limit(20)
    val bad = e.select(round(VectorFns.cosine(col("embedding"), col("embedding")), 9).as("c"))
      .filter(col("c") =!= 1.0).count()
    assert(bad == 0)
  }
}

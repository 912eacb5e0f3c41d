package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions over `array<float|double>` columns.
  *
  * The dot-product kernel is the native codegen'd [[DotProduct]] expression
  * (injected as `vec_dot` by GraftExtensions): Spark's higher-order-function
  * composition (`zip_with`+`aggregate`) evaluates interpreted and allocates
  * an intermediate array per row, while the native expression is a fused
  * multiply-accumulate loop inside whole-stage codegen. Arithmetic is a
  * double-precision left-fold in element order — bit-identical to the DuckDB
  * oracle's `list_cosine_similarity`/`list_dot_product` accumulation.
  */
object VectorFns {

  /** Sequential left-fold dot product in double precision (codegen'd). */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}

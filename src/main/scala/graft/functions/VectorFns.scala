package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions over `array<float>` columns.
  *
  * Pure `functions._` compositions (`zip_with` + `aggregate`) so the dot
  * product is evaluated inside codegen with no serialization; arithmetic is
  * carried out in double to match the DuckDB oracle's
  * `list_cosine_similarity` (which also accumulates in double, in element
  * order — same left-fold, so results are bit-identical).
  */
object VectorFns {

  /** Sequential left-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}

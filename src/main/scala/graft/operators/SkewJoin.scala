package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * AQE's skew-join splitting (enabled in GraftSession) handles most skew at
  * runtime; this operator is the explicit form for pipelines that know their
  * hot keys up front (e.g. joining 100 TB of events against a user table
  * where a few bot users dominate): the large side spreads each key over
  * `nSalts` shuffle partitions via a deterministic per-row salt, the small
  * side is replicated `nSalts`× — trading a bounded blow-up of the small
  * side for even task sizes on the large one.
  */
object SkewJoin {

  /** Inner equi-join of `large` with `small` on `key`, salted `nSalts` ways.
    * Result equals `large.join(small, key)` row-for-row.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, nSalts: Int): DataFrame = {
    // Deterministic per-row salt: hash of the large side's whole row spreads
    // equal keys without RNG (stable across retries — important: a random
    // salt breaks task-retry idempotence).
    val salted = large.withColumn(
      "__salt", pmod(hash(large.columns.toIndexedSeq.map(col): _*), lit(nSalts)))
    val replicated = small
      .withColumn("__salt", explode(array((0 until nSalts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}

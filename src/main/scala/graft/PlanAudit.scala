package graft

import org.apache.spark.sql.SparkSession

/** Plan audit over the whole query inventory — exchange / join operator
  * counts plus detection of the two plan shapes that must never appear
  * unannounced: `CartesianProduct` (always a bug at scale) and
  * `BroadcastNestedLoopJoin` outside an explicit allowlist. Runs as a
  * regression GATE: `PlanAuditSpec` fails `sbt test` on any violation, and
  * the CLI main exits nonzero, so a plan that drifts to a quadratic join
  * breaks the build instead of surfacing one round later in a bench.
  *
  * `runMain graft.PlanAudit [sfDir]` for the one-line-per-query report.
  */
object PlanAudit {

  /** Queries whose BroadcastNestedLoopJoin is deliberate:
    *  - s01: the exact ANN baseline scores every (query, corpus) pair by
    *    design — a broadcast of 10 query rows against the corpus scan.
    *  - t08/t11: a 1-row `crossJoin(broadcast(<count>))` scalar attach —
    *    corpus × 1 row, map-side, benign.
    */
  val bnljAllowlist: Set[String] =
    Set("s01_ann_cosine_topk", "t08_tfidf_topterms", "t11_cooccur_pmi")

  final case class Audit(
      name: String,
      exchanges: Int,
      sortMergeJoins: Int,
      broadcastHashJoins: Int,
      cartesian: Boolean,
      bnlj: Boolean,
      globalWindow: Boolean,
      error: Option[String]) {
    def line: String = {
      val flags = (if (cartesian) " CARTESIAN!" else "") +
        (if (bnlj) " BNLJ" else "") + (if (globalWindow) " GLOBAL-WINDOW!" else "")
      error match {
        case Some(e) => f"[audit] $name%-28s FAILED: ${e.take(100)}"
        case None =>
          f"[audit] $name%-28s exch=$exchanges%2d smj=$sortMergeJoins%2d bhj=$broadcastHashJoins%2d$flags"
      }
    }
  }

  def auditOne(spark: SparkSession, sfDir: String, name: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Audit =
    try {
      val qe = fn(spark, sfDir).queryExecution
      val plan = qe.executedPlan.toString
      // An unpartitioned window moves every row to one task (t14's old
      // prefix-sum bug class) — detect on the logical plan, where the
      // partition spec is explicit and AQE wrapping can't hide it.
      val globalWindow = qe.optimizedPlan.collectFirst {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }.nonEmpty
      def n(s: String) = s.r.findAllIn(plan).length
      Audit(name, n("Exchange"), n("SortMergeJoin"), n("BroadcastHashJoin"),
        plan.contains("CartesianProduct"), plan.contains("BroadcastNestedLoopJoin"),
        globalWindow, None)
    } catch {
      case e: Throwable => Audit(name, 0, 0, 0, cartesian = false, bnlj = false,
        globalWindow = false, error = Some(String.valueOf(e.getMessage)))
    }

  def auditAll(spark: SparkSession, sfDir: String): Seq[Audit] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      auditOne(spark, sfDir, name, fn)
    }

  /** Violation strings (empty = gate passes): plan-compile failures,
    * cartesian products anywhere, BNLJ outside the allowlist — and stale
    * allowlist entries whose BNLJ disappeared (so the list can't rot). */
  def violations(audits: Seq[Audit]): Seq[String] =
    audits.collect {
      case a if a.error.isDefined => s"${a.name}: plan failed: ${a.error.get}"
      case a if a.cartesian => s"${a.name}: CartesianProduct in plan"
      case a if a.bnlj && !bnljAllowlist(a.name) =>
        s"${a.name}: BroadcastNestedLoopJoin not in allowlist"
      case a if a.globalWindow =>
        s"${a.name}: unpartitioned Window (all rows to one task)"
    } ++
      bnljAllowlist.toSeq.sorted.collect {
        case n if !audits.exists(a => a.name == n && a.bnlj) =>
          s"$n: allowlisted BNLJ no longer present — remove it from bnljAllowlist"
      }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.get("graft-plan-audit")
    val audits = auditAll(spark, sfDir)
    audits.foreach(a => println(a.line))
    val v = violations(audits)
    spark.stop()
    if (v.nonEmpty) {
      v.foreach(x => System.err.println(s"[audit] VIOLATION: $x"))
      sys.exit(1)
    }
  }
}

package graft

/** The plan-shape regression gate (see [[PlanAudit]]): every inventory
  * query's physical plan must compile, contain no CartesianProduct, and no
  * BroadcastNestedLoopJoin outside the documented allowlist. Plans are
  * compiled (not executed) at sf0.001, which is enough to expose join
  * strategy and exchange shape.
  */
class PlanAuditSpec extends SparkSpec {

  test("no inventory plan has a cartesian product or unannounced BNLJ") {
    val audits = PlanAudit.auditAll(spark, sf)
    assert(audits.size == SparkEntry.queries.size)
    val v = PlanAudit.violations(audits)
    assert(v.isEmpty, "plan violations:\n" + v.mkString("\n") + "\n\n" +
      audits.map(_.line).mkString("\n"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** MemoLedger invariants: exclusive build timing (nested builds must not
  * double-count into their ancestors — the ledger SUM is the wall spent
  * building), and the two-tier corpus stamps. */
class MemoLedgerSpec extends AnyFunSuite {

  test("nested builds record exclusive time; the ledger sums to true wall") {
    MemoLedger.drain()
    MemoLedger.timed("t", "parent") {
      Thread.sleep(60)
      MemoLedger.timed("t", "child") {
        Thread.sleep(90)
        MemoLedger.timed("t", "grandchild")(Thread.sleep(40))
      }
    }
    val by = MemoLedger.drain().map(b => b.artifact -> b.sec).toMap
    assert(by.keySet == Set("parent", "child", "grandchild"))
    // Child's recorded time excludes the grandchild; parent excludes both.
    assert(by("grandchild") >= 0.035 && by("grandchild") < 0.09,
      s"grandchild ${by("grandchild")}")
    assert(by("child") >= 0.08 && by("child") < 0.14, s"child ${by("child")}")
    assert(by("parent") >= 0.05 && by("parent") < 0.12, s"parent ${by("parent")}")
    // The invariant Bench's memo_build_sec relies on: Σ exclusive ≈ wall.
    val sum = by.values.sum
    assert(sum >= 0.18 && sum < 0.3, s"ledger sum $sum != ~0.19 wall")
  }

  test("a failed build records nothing but still unwinds the stack") {
    MemoLedger.drain()
    intercept[RuntimeException](
      MemoLedger.timed("t", "outer") {
        MemoLedger.timed("t", "boom")(throw new RuntimeException("x"))
      })
    assert(MemoLedger.drain().isEmpty)
    // The stack unwound: a fresh build on the same thread is unaffected.
    MemoLedger.timed("t", "after")(Thread.sleep(10))
    val after = MemoLedger.drain()
    assert(after.map(_.artifact) == Seq("after") && after.head.sec >= 0.005)
  }

  test("dirStamp caches within the TTL; freshDirStamp and contentStamp see a rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ledger_stamp")
    val f = dir.resolve("part-00000.parquet")
    java.nio.file.Files.write(f, Array.fill[Byte](256)(1))
    MemoLedger.invalidateStamps()
    val s0 = MemoLedger.dirStamp(dir.toString)
    val c0 = MemoLedger.contentStamp(dir.toString)
    val mtime = java.nio.file.Files.getLastModifiedTime(f)
    // Same-size same-mtime rewrite: cached dirStamp AND the walk itself
    // miss it; contentStamp must not.
    java.nio.file.Files.write(f, Array.fill[Byte](256)(2))
    java.nio.file.Files.setLastModifiedTime(f, mtime)
    assert(MemoLedger.dirStamp(dir.toString) == s0, "cached stamp moved")
    assert(MemoLedger.freshDirStamp(dir.toString) == s0,
      "mtime+size walk saw a same-size same-mtime rewrite (it cannot)")
    assert(MemoLedger.contentStamp(dir.toString) != c0,
      "content stamp missed a byte rewrite")
  }
}

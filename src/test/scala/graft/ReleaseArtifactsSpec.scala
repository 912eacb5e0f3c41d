package graft

import graft.operators.{Dedup, ReleaseArtifacts}

/** The durable release-artifact layout: persisted kernel tables must drive
  * the memo consumers to batch-identical results, and the manifest must
  * refuse stale corpora and mismatched kernel parameters. */
class ReleaseArtifactsSpec extends SparkSpec {

  private def run(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq

  test("persisted artifacts drive d36/d02/d06 to batch-identical results") {
    val dir = java.nio.file.Files.createTempDirectory("graft_release").toString
    val names = Seq("d36_release_dedup_report", "d02_dedup_minhash_lsh",
      "d06_dedup_clusters")
    Dedup.clearCorpusMemo()
    val expected = names.map(n => n -> run(n)).toMap
    ReleaseArtifacts.write(spark, sf, dir)
    // A fresh session would have an empty memo; clearing simulates it.
    Dedup.clearCorpusMemo()
    ReleaseArtifacts.open(spark, sf, dir)
    // Proof the read path is REAL: the memoized verified-pair table now
    // resolves to a parquet scan of the frozen layout, not a checkpoint.
    val roots = Dedup.corpusVerifiedPairs(spark, sf).queryExecution.analyzed
      .collectLeaves().flatMap {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString)
            case _ => Nil
          }
        case _ => Nil
      }
    assert(roots.exists(_.contains(dir)),
      s"verified pairs not parquet-backed by $dir (roots: $roots)")
    names.foreach { n =>
      assert(run(n) == expected(n), s"$n differs when read from $dir")
    }
    Dedup.clearCorpusMemo() // drop the parquet-backed installs for later suites
  }

  test("open refuses a corpus that changed since the freeze") {
    val corpus = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    val src = java.nio.file.Paths.get(sf)
    java.nio.file.Files.list(src).forEach { p =>
      java.nio.file.Files.copy(p, java.nio.file.Paths.get(corpus, p.getFileName.toString))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_release2").toString
    Dedup.clearCorpusMemo()
    ReleaseArtifacts.write(spark, corpus, dir)
    // In-place rewrite: same path, new mtime — the content stamp moves.
    val f = java.nio.file.Files.list(java.nio.file.Paths.get(corpus))
      .findFirst().get()
    java.nio.file.Files.setLastModifiedTime(
      f, java.nio.file.attribute.FileTime.fromMillis(12345L))
    Dedup.clearCorpusMemo()
    val e = intercept[IllegalStateException](ReleaseArtifacts.open(spark, corpus, dir))
    assert(e.getMessage.contains("changed since the freeze"))
    Dedup.clearCorpusMemo()
  }

  test("open refuses mismatched kernel parameters and a missing manifest") {
    val dir = java.nio.file.Files.createTempDirectory("graft_release3").toString
    Dedup.clearCorpusMemo()
    ReleaseArtifacts.write(spark, sf, dir, threshold = 0.5)
    Dedup.clearCorpusMemo()
    val e = intercept[IllegalStateException](
      ReleaseArtifacts.open(spark, sf, dir, threshold = 0.6))
    assert(e.getMessage.contains("threshold"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "_manifest.json"))
    val e2 = intercept[IllegalStateException](ReleaseArtifacts.open(spark, sf, dir))
    assert(e2.getMessage.contains("no release manifest"))
    Dedup.clearCorpusMemo()
  }
}

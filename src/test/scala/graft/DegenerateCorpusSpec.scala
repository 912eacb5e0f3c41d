package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Robustness gate for pathological inputs. At 100 TB the corpus WILL
  * contain empty partitions, empty documents, whitespace-only documents,
  * and thousand-copy duplication clusters — a curation engine that throws
  * or hangs on any of them fails in production at 3 a.m., not in review.
  * This suite drives the document-family inventory (text / dedup /
  * pipeline + the doc-derived profile queries) over three corpora the
  * shipped testdata never produces:
  *
  *  - EMPTY: a zero-row documents table (a source feed that shipped
  *    nothing today — the daily-delta case for d10/p05-style runs);
  *  - DEGENERATE DOCS: empty text, whitespace-only text, a 1-token doc,
  *    and one normal doc (the rows a crawler emits around truncated
  *    fetches);
  *  - CLONE STORM: 40 byte-identical copies + 2 distinct docs (the
  *    boilerplate / mirror regime the dedup family exists for).
  *
  * The contract asserted is deliberately minimal and universal: every
  * query PLANS and EXECUTES (collect() returns; no exception, no
  * degenerate-input crash), and on the clone storm d01's keep rule
  * actually collapses the planted clones. Value-level semantics stay
  * with the per-operator specs and the DuckDB oracle — this gate is
  * about not falling over.
  */
class DegenerateCorpusSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private def writeCorpus(name: String, rows: Seq[Row]): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-degen-$name").toString
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, math.max(1, rows.size / 4)), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // Companion embeddings table (p03 reads it): one deterministic nonzero
    // vector per document — EMPTY corpus ⇒ empty embeddings, the zero-row
    // eval-set case p03's semantic leg must survive.
    import spark.implicits._
    rows.map { r =>
      val id = r.getLong(0)
      (id, Array.tabulate(8)(j => (((id * 31 + j * 17) % 97) + 1).toFloat),
        (id % 10).toInt)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private lazy val emptyDir = writeCorpus("empty", Seq.empty)
  private lazy val degenDir = writeCorpus("degen", Seq(
    Row(1L, "", "en", "srcA", 0L),
    Row(2L, "   \t  ", "en", "srcA", 6L),
    Row(3L, "word", "de", "srcB", 4L),
    Row(4L, "the table scan joins the fast row batch with a slow merge sort",
      "en", "srcB", 62L)))
  private lazy val cloneDir = writeCorpus("clones",
    (1L to 40L).map(i =>
      Row(i, "all rights reserved the template page body repeats here verbatim",
        "en", "srcA", 64L)) ++ Seq(
      Row(41L, "one original document about spark query planning", "en", "srcB", 48L),
      Row(42L, "another original document about corpus curation", "en", "srcB", 47L)))

  /** The document-family inventory: every query whose only input is the
    * documents table (text, dedup, pipeline, media stubs derive from it,
    * plus the doc-keyed profile/sampling queries). Embedding- and
    * event-fed families are excluded — their degenerate-input surface is
    * the vectors/events tables, not this corpus.
    */
  private val docQueries: Seq[String] = SparkEntry.inventory.map(_.name).filter { n =>
    (n.startsWith("t") || n.startsWith("d") || n.startsWith("p") ||
      n.startsWith("m") || n == "q38_key_skew_profile") &&
      !Set("d05_dedup_embedding", "d14_semantic_dedup", "d15_cluster_best_keep",
        "d16_dup_provenance", "d17_embedding_decontaminate").contains(n)
  }

  private def runAll(dir: String, corpus: String): Unit = {
    val failures = docQueries.flatMap { name =>
      try { SparkEntry.queries(name)(spark, dir).collect(); None }
      catch { case e: Throwable =>
        Some(s"$name on $corpus corpus: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  private lazy val oneDocDir = writeCorpus("onedoc", Seq(
    Row(7L, "a single document rides the entire inventory alone today", "en",
      "srcA", 57L)))

  test("every document-family query survives a zero-row corpus") {
    runAll(emptyDir, "EMPTY")
  }

  test("every document-family query survives a one-document corpus") {
    // The smallest non-empty corpus: no pairs for any dedup join, no
    // second doc for any ratio denominator, a single media payload for
    // the m-family — every query must still plan and execute.
    runAll(oneDocDir, "ONE-DOC")
  }

  test("every document-family query survives empty/whitespace/1-token docs") {
    runAll(degenDir, "DEGENERATE")
  }

  test("every document-family query survives a 40-clone storm; d01 collapses it") {
    runAll(cloneDir, "CLONE-STORM")
    // d01 emits one row per fingerprint GROUP (fp, keep_id, n_dups): the 40
    // planted clones collapse to one group with representative doc_id 1.
    val groups = SparkEntry.queries("d01_dedup_exact")(spark, cloneDir)
      .select("keep_id", "n_dups").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(groups.length == 3, s"expected 3 groups, got ${groups.length}")
    assert(groups.head == (1L, 40L),
      s"clone cluster should collapse to (keep_id 1, n_dups 40), got ${groups.head}")
    // m12's clique path on the media axis: 40 byte-identical payloads are
    // ONE signature with multiplicity 40 — the signature-grain
    // pre-collapse must emit a single clique cluster (rep = min doc_id 1,
    // all 780 pairwise edges at Hamming 0) rather than 780 pair rows
    // through the band join.
    val cliques = SparkEntry.queries("m12_media_neardup_clusters")(spark, cloneDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val clone = cliques.find(_._1 == 1L)
    assert(clone.nonEmpty, s"no cluster with rep 1 in $cliques")
    assert(clone.get._2 >= 40L && clone.get._3 >= 780L,
      s"clone clique not collapsed at signature grain: ${clone.get}")
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The events/embeddings wing of the degenerate-input gate
  * ([[DegenerateCorpusSpec]] covers the documents axis). The same 3 a.m.
  * inputs exist on every feed: an event stream that shipped nothing today,
  * a stream that is ONE user at a metronome-uniform rate (zero variance —
  * every z-score/stddev denominator), an embeddings table with zero rows,
  * and a table where every vector is byte-identical (a collapsed encoder —
  * zero distance everywhere, ties in every top-k, degenerate k-means
  * cells). Contract as the documents gate: every query PLANS and EXECUTES;
  * value semantics stay with the per-operator specs and oracles.
  */
class DegenerateEventsEmbeddingsSpec extends SparkSpec {

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("props", StringType, nullable = false)))

  private def writeEvents(name: String, rows: Seq[Row]): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-degen-$name").toString
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, math.max(1, rows.size / 16)), eventSchema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def writeEmbeddings(name: String,
      rows: Seq[(Long, Array[Float], Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-degen-$name").toString
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // Companion documents (d15/d16 join vectors with their docs): one
    // trivially distinct doc per vector.
    rows.map { case (id, _, _) =>
      (id, s"document number $id about topic ${id % 7}", "en",
        s"src${id % 3}", 30L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private lazy val emptyEventsDir = writeEvents("ev-empty", Seq.empty)

  /** One user, metronome-uniform: 2 events every hour for 72 hours, value
    * constant — the zero-variance stream (a health-check bot being the
    * only traffic left after an outage). Every trailing-window stddev is
    * 0, every per-user distribution is a point mass. */
  private lazy val singleUserDir = writeEvents("ev-one-user", {
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val types = Seq("view", "click", "signup", "purchase", "error")
    (0 until 144).map { i =>
      Row(i.toLong, new Timestamp(t0 + i.toLong * 30 * 60 * 1000), 7L,
        types(i % types.size), 1.0, s"""{"k": ${i % 5}}""")
    }
  })

  private lazy val emptyEmbDir = writeEmbeddings("emb-empty", Seq.empty)

  /** A collapsed encoder: every vector identical (and nonzero). Distances
    * are 0 everywhere, every top-k is all ties, every k-means refinement
    * puts the whole corpus in one cell. */
  private lazy val identicalEmbDir = writeEmbeddings("emb-identical",
    (0L until 120L).map(i =>
      (i, Array.tabulate(8)(j => (j + 1).toFloat), (i % 3).toInt)))

  /** Queries whose ONLY input is the events table (q16/q22/q26 also read
    * TPC-H dimension tables — their degenerate surface is those tables,
    * not this stream). */
  private val eventQueries = Seq(
    "q11_events_hourly", "q12_sessionize", "q13_daily_active_users",
    "q14_json_props", "q17_range_join", "q29_funnel_conversion",
    "q30_cohort_retention", "q32_last_touch_attribution",
    "q33_event_transitions", "q34_rfm_segments", "q39_rate_anomaly",
    "q40_wau_stickiness", "q41_conversion_latency", "q42_session_paths",
    "q45_point_in_time_enrich", "q46_purchase_cadence")

  /** The embeddings-fed inventory: the whole similarity family plus the
    * embedding-side dedup/decontamination queries the documents gate
    * excludes. */
  private val embeddingQueries: Seq[String] =
    SparkEntry.inventory.map(_.name).filter(_.startsWith("s")) ++
      Seq("d05_dedup_embedding", "d14_semantic_dedup", "d15_cluster_best_keep",
        "d16_dup_provenance", "d17_embedding_decontaminate")

  private def runAll(names: Seq[String], dir: String, corpus: String): Unit = {
    val failures = names.flatMap { name =>
      try { SparkEntry.queries(name)(spark, dir).collect(); None }
      catch { case e: Throwable =>
        Some(s"$name on $corpus corpus: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every event-family query survives a zero-row events table") {
    runAll(eventQueries, emptyEventsDir, "EMPTY-EVENTS")
  }

  test("every event-family query survives a single-user zero-variance stream") {
    runAll(eventQueries, singleUserDir, "SINGLE-USER")
  }

  test("every embedding-family query survives a zero-row embeddings table") {
    runAll(embeddingQueries, emptyEmbDir, "EMPTY-EMBEDDINGS")
  }

  test("every embedding-family query survives an all-identical embedding corpus") {
    runAll(embeddingQueries, identicalEmbDir, "IDENTICAL-EMBEDDINGS")
  }

  /** Sparse, non-dense ids: every vec_id ≥ 1000, far above any codebook
    * size used in the inventory. The table carries no dense-0-based id
    * contract, so every k-means/PQ/IVF seed selection must come from the
    * TRUE k lowest ids (TakeOrdered), never a `vec_id < k` literal — on
    * this corpus the literal form silently trains ZERO codebooks. */
  private lazy val sparseIdEmbDir = writeEmbeddings("emb-sparse-ids", {
    def lcg(seed: Long): Float = {
      val x = (seed * 6364136223846793005L + 1442695040888963407L) >>> 33
      (x % 1000L).toFloat / 1000000.0f // noise in [0, 1e-3)
    }
    val base = (0L until 118L).map { i =>
      val cluster = (i % 4).toInt
      (1000L + i, Array.tabulate(8)(j =>
        (if (j == cluster * 2) 1.0f else 0.0f) + lcg(i * 8 + j)), cluster)
    }
    // One planted near-identical pair (ids 2000/2001) for the d05 kernel.
    val dup = Array.tabulate(8)(j => if (j == 1) 1.0f else 0.001f * j)
    base ++ Seq((2000L, dup, 0), (2001L, dup.clone(), 0))
  })

  test("every embedding-family query survives a sparse-id corpus (min vec_id >= 1000)") {
    runAll(embeddingQueries, sparseIdEmbDir, "SPARSE-IDS")
  }

  test("codebook seeds come from the true k lowest vec_ids on a sparse-id corpus") {
    import org.apache.spark.sql.functions.col
    import graft.operators.{Dedup, Similarity}
    import spark.implicits._
    val e = spark.read.parquet(s"$sparseIdEmbDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // PQ: m=2 subspaces × k=4 centroids over dim-8 vectors — non-empty
    // and fully shaped even though min vec_id (1000) >> k.
    val pq = Similarity.pqTrain(spark, e, m = 2, k = 4, iters = 2)
    assert(pq.length == 2 && pq.forall(_.length == 4) &&
      pq.forall(_.forall(_.length == 4)),
      s"pqTrain trained ${pq.length} subspaces on the sparse-id corpus")
    // IVF: a full nCells-entry codebook, cell ids = the seed vec_ids.
    val ivf = Similarity.ivfCodebookOf(spark, e, nCells = 6, kmeansIters = 2)
    assert(ivf.length == 6, s"ivfCodebookOf seeded ${ivf.length}/6 cells")
    assert(ivf.map(_._1).min == 1000, "IVF seeds are not the lowest vec_ids")
    // d05 kernel: codebook seeds AND output both survive sparse ids — the
    // planted byte-identical pair (2000, 2001) is found.
    val ev = e.as[(Long, Array[Float])]
    val (pairs, _) = Dedup.embeddingPairsFrom(ev, 0.99, nCells = 6, kmeansIters = 2)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((2000L, 2001L)) || got.contains((2001L, 2000L)),
      s"planted near-dup pair missing from $got")
  }
}

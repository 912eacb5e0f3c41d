package graft

import org.apache.spark.sql.functions._

/** Scale rehearsal (dev main, feeds SCALE.md): the closest local[32] proxy
  * for the "would this still work at 100×?" question — build a ~10× corpus
  * from sf0.1's documents and compare the dedup family's wall time against
  * the 1× baseline.
  *
  * Corpus construction: 10 copies of the 5k-doc sf0.1 documents table,
  * copy i offset in doc_id space and every whitespace token suffixed with
  * a copy tag (`$1xi`). The tagging makes copies mutually shingle-disjoint
  * (so candidate structure does not explode combinatorially — that would
  * be a different, dup-flooded workload) while REPLICATING each copy's
  * internal duplicate/near-dup structure, so dup groups, LSH candidates,
  * and verify pairs all scale ~linearly with the corpus — the regime the
  * 100 TB design assumes (healthy data, bounded dup rate).
  *
  * Reported per query: min-of-2 wall at 1× and 10×, the ratio, and the
  * output row counts (which must scale ~10× for the dup-family queries).
  * A ratio well under ~10 on equal per-row work means fixed per-job
  * overhead still dominates at sf0.1 — the scale-friendly direction.
  *
  * `runMain graft.ScaleRehearsal [sfDir] [outDir] [k]`
  */
object ScaleRehearsal {

  /** The k× rehearsal corpus: copy i is doc_id-offset and every
    * whitespace token is suffixed `x$i`, making copies mutually
    * shingle-disjoint while replicating each copy's internal dup/near-dup
    * structure — dup groups, candidates, and verified pairs scale exactly
    * k×. Shared by the manual 10× rehearsal main and the CI-shape
    * [[ScaleLinearitySpec]]. The copy stride is `max(doc_id) + 1` (one
    * tiny agg), so copies can NEVER collide with base ids whatever range
    * a scale-factor directory carries — a fixed literal stride would
    * silently alias ids the moment a corpus crossed it. */
  def scaledDocs(docs: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame =
    taggedCopies(docs, k, verbatim = 1)

  /** THE corpus-copy builder (shared by [[scaledDocs]] and
    * SkewRehearsal's skewed/dup-heavy corpora): k doc_id-offset copies of
    * the documents table; copies with index < `verbatim` keep the text
    * byte-identical (planted exact-dup clusters of that size), the rest
    * tag every token with a per-copy suffix — unique text with the same
    * token/shingle statistics. */
  def taggedCopies(docs: org.apache.spark.sql.DataFrame, k: Int,
      verbatim: Int): org.apache.spark.sql.DataFrame = {
    val stride = docs.agg(max("doc_id")).head().getLong(0) + 1L
    (0 until k).map { i =>
      val text =
        if (i < verbatim) col("text")
        else regexp_replace(col("text"), "(\\S+)", "$1x" + i)
      docs.select(
        (col("doc_id") + lit(i * stride)).as("doc_id"),
        text.as("text"), col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)
  }

  /** k× embeddings table: copy c keeps each vector VERBATIM under an
    * offset vec_id (unlike [[scaledDocs]]' tagged tokens, identical
    * vectors are the point — each copy's cosines against the id<25 eval
    * slice reproduce copy 0's exactly, which is what gives d17 its exact
    * k-scaling law: flagged(k×) = k·flagged(1×) + (k−1)·|eval|, the
    * second term being the copies of the eval vectors themselves, all
    * cos 1.0 self-matches in the corpus half). Copy stride is
    * `max(vec_id) + 1`, same no-collision guarantee as [[scaledDocs]]. */
  def scaledVecs(vecs: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame = {
    val stride = vecs.agg(max("vec_id")).head().getLong(0) + 1L
    (0 until k).map { i =>
      if (i == 0) vecs
      else vecs.withColumn("vec_id", col("vec_id") + lit(i * stride))
    }.reduce(_ unionAll _)
  }

  /** k× events table: copy i offsets event_id and user_id (stride =
    * max + 1 each) and keeps ts/type/value/props verbatim — the corpus
    * grows by USERS (each copy a disjoint user population with identical
    * behavior), the realistic growth direction: per-user history stays
    * constant while distinct-user counts, session counts, funnels and
    * cohorts all scale exactly k×. Built from [[graft.sources.Tables
    * .events]] so the written ts is a plain µs TIMESTAMP at any source
    * encoding. */
  def scaledEvents(events: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame = {
    val r = events.agg(max("event_id"), max("user_id")).head()
    val (strideE, strideU) = (r.getLong(0) + 1L, r.getLong(1) + 1L)
    (0 until k).map { i =>
      if (i == 0) events
      else events
        .withColumn("event_id", col("event_id") + lit(i * strideE))
        .withColumn("user_id", col("user_id") + lit(i * strideU))
    }.reduce(_ unionAll _)
  }

  /** k× TPC-H fact tables: copy i offsets the ORDER key on both facts
    * with one shared stride (lineitem rows follow their order), keeps
    * customer/part/supplier keys in the 1× dimension range (the SAME
    * customers place k× the orders — growth over time, the star-join
    * reality: facts grow, dimensions don't), and leaves all measures
    * verbatim. Dimensions are copied through unchanged. */
  def scaledFacts(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      outDir: String, k: Int): Unit = {
    import graft.sources.Tables
    val orders = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val stride = orders.agg(max("o_orderkey")).head().getLong(0) + 1L
    def copies(df: org.apache.spark.sql.DataFrame, keyCol: String) =
      (0 until k).map { i =>
        if (i == 0) df else df.withColumn(keyCol, col(keyCol) + lit(i * stride))
      }.reduce(_ unionAll _)
    copies(orders, "o_orderkey").repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    copies(li, "l_orderkey").repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "target/scale10x"
    val k = if (args.length > 2) args(2).toInt else 10
    // Optional 4th arg: comma-separated query names — restrict the
    // document-family wave to just those (targeted re-measures after a
    // plan change) and skip the ANN/d17/s07 sections entirely.
    val only: Set[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).filter(_.nonEmpty).toSet
      else Set.empty
    val spark = GraftSession.get("graft-scale-rehearsal")

    // 5th arg "reuse": skip the corpus writes when a previous run already
    // built $outDir at this k (verified by row count; the embeddings twin
    // must also carry `label` — s13 reads it, older builds dropped it) —
    // targeted re-measures after a plan change shouldn't pay the build
    // again.
    val reuseReq = args.length > 4 && args(4) == "reuse"
    val reuse = reuseReq && {
      try spark.read.parquet(s"$outDir/documents.parquet").count() ==
        spark.read.parquet(s"$sfDir/documents.parquet").count() * k
      catch { case _: Exception => false }
    }
    val reuseEmb = reuseReq && {
      try spark.read.parquet(s"$outDir/embeddings.parquet")
        .columns.contains("label")
      catch { case _: Exception => false }
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    if (!reuse) {
      scaledDocs(docs, k).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    }
    val n1 = docs.count()
    val nK = spark.read.parquet(s"$outDir/documents.parquet").count()
    println(s"[scale] corpus: ${n1} docs at 1x -> ${nK} docs at ${k}x ($outDir${if (reuse) ", reused" else ""})")
    // The k× embeddings twin (verbatim copies, offset ids) is written up
    // front: p03's sem leg and the d17 rows below read it from $outDir.
    if (!reuseEmb) {
      scaledVecs(spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"), col("label")), k)
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    }

    // Dedup family, plus the round-5 de-hinted queries (d09's eval probe
    // and t13's bigram-LM shuffle join, with t08's allowlisted vocabulary
    // broadcast): the rehearsal shows the post-hint-removal plans scale —
    // the model/eval relations here grow WITH this corpus (tagged tokens
    // make each copy's vocabulary distinct), so this is the adversarial
    // direction for the AQE-chosen join strategy, not the friendly one.
    val names = Seq("d02_dedup_minhash_lsh", "d06_dedup_clusters",
      "d07_dedup_keep_list", "d10_incremental_keep",
      "d09_decontaminate", "t13_bigram_perplexity", "t08_tfidf_topterms",
      // Round-5 additions: the shingle-keyed count/min windows (one shuffle
      // of the positional/distinct shingle stream), the two-phase
      // prefix-scan packing, the three-detector consensus (shared shingle
      // pass), and the frequency spectrum — each a distinct shuffle
      // pattern to rehearse.
      "d11_repeated_spans", "t16_shingle_novelty", "t17_sequence_pack",
      "d12_neardup_consensus", "t18_freq_spectrum",
      // Round-6: the map-only scrub — the no-shuffle control row; its
      // ratio is the pure scan-cost floor the shuffled queries sit above —
      // and the chunk scrub, whose one chunk-keyed exchange is the C4-style
      // corpus-edit shuffle (output rows scale 10x; the tagged copies keep
      // chunks disjoint so survivors scale with the corpus).
      "t19_blocklist_scrub", "d13_chunk_scrub",
      // t21 is the one iterative driver-loop trainer: its per-iteration
      // work is VOCABULARY-sized, and the tagged copies multiply the
      // vocabulary 10x — the adversarial direction for that claim.
      "t21_bpe_merges",
      // Round-6 third/fourth wave: t27's bucket model is learned from the
      // corpus (the tagged copies grow token volume 10x while the model
      // stays 512 rows — the claim is the scoring join's build side is
      // corpus-independent); m07/m08 are the doc-keyed lag-window pair;
      // p02 composes the rate build + md5 decision + prefix packing.
      "t27_dsir_importance", "m07_scene_cuts", "m08_voiced_segments",
      "p02_mix_pipeline",
      // Round-8 additions: m05 is the frame-EXPLODING op (rows multiply
      // ~17× before the frame-keyed window — the largest intermediate of
      // the m-family); p03 composes three evidence legs + the manifest
      // left-joins, reading BOTH scaled tables.
      "m05_frame_energy", "p03_release_audit",
      // Round-9 additions: d18 shares d04's candidate join but keys the
      // verdict on the SMALLER side's size (containment); d19 is the
      // eval-keyed regrouping of d09's bounded join. Round 10 df-capped
      // the shared candidate join (hot shingles excluded from pairing,
      // intersection exact) and added d04 itself to the wave — both must
      // now sit in the shuffled-family band, not above it.
      "d04_ngram_jaccard",
      "d18_containment_pairs", "d19_eval_leak_report",
      // Round-9 text-hygiene pair: both map-only multi-regex scans (t19's
      // no-shuffle shape) — their ratios must land on the same scan-cost
      // floor as the t19 control row.
      "t30_pii_scrub", "t31_encoding_audit",
      // Round-9 second wave: d20's output rows are SOURCE-PAIR-bounded
      // (scale-invariant count, values grow k×) while its distinct
      // (source, shingle) input grows k× — the matrix must not blow up
      // when the per-source vocabularies do; t32's rank window rides the
      // k×-vocabulary growth (the tagged copies are its adversarial
      // direction: per-source vocab grows WITH the corpus, not Heaps-
      // sublinear); m09 is the byte-axis prefix-scan twin of t17.
      "d20_cross_source_overlap", "t32_zipf_fit", "m09_shard_manifest",
      // Round-9 third wave: d21's leak join has a CORPUS-PROPORTIONAL
      // probe side (the 10% validation half — unlike d09/d19's bounded
      // eval sets), the adversarial direction for the no-hint rule; t33
      // is the hash-ordered range exchange + two-phase global rank.
      "d21_split_leakage", "t33_epoch_shuffle",
      // p04 composes d01's fingerprint window + t33's permutation key +
      // the range-exchange prefix pack — the full epoch-manifest path;
      // d22 rides d02's exact shapes plus a candidate-sized array join.
      "p04_epoch_assembly", "d22_sketch_calibration",
      // Round-10 wave: d23/t34 ride the df aggregate (vocabulary-keyed;
      // the tagged copies grow the vocabulary k× — the adversarial
      // direction); q38 is two aggregates; m10 explodes m09's manifest
      // ∝ total bytes / shard budget; p05's anti-join probe side is the
      // resident fingerprint set (corpus-proportional — d21's stance);
      // m11's inline eval slice GROWS with this corpus (%19 sampling) —
      // deliberately adversarial for the literal-inline path, d17's
      // eval-size crossover story on the media axis. q39 reads the
      // events table (not scaled by this corpus) and is hours×types-
      // bounded by construction.
      "d23_boilerplate_report", "t34_templated_docs", "q38_key_skew_profile",
      "m10_shard_fill", "p05_refresh_manifest", "m11_media_decontaminate",
      // Round-10 late pair: d24 is d01's fingerprint window + a source-
      // keyed aggregate (output = #sources, scale-invariant row count);
      // p06 runs that window plus TWO source-keyed aggregates and two
      // 1-row minimum attachments — both must ride d01's band, since
      // the tagged copies keep fingerprints distinct across copies
      // (dup groups stay within-copy, the window's group sizes are
      // scale-invariant while group COUNT grows k×).
      "d24_dup_inflation", "p06_dedup_mix_rates",
      // Round-10 final wave: t35 rides t05's map-only scoring into a
      // bounded (source, lang, pred) aggregate; p07 composes the t19/t20
      // map-only filters with d01's fingerprint window; d25 is two exact
      // aggregates over the fingerprint stream; s13 is s01's broadcast-
      // probe scan (reads the k× embeddings twin) + a bounded aggregate.
      "t35_lang_mismatch", "p07_survival_funnel", "d25_cluster_spectrum",
      "s13_knn_label_purity",
      // d26 edits the corpus against the d23 vocabulary: the tagged
      // copies multiply the vocabulary k× while per-copy hot structure
      // replicates — the hot join's build side grows WITH the corpus
      // (the adversarial direction, d23/t34's axis).
      "d26_template_scrub",
      // t36 joins t24's token-explode aggregate with t20's map-only
      // gate — two doc-keyed relations, one linear join, bounded bins.
      "t36_classifier_calibration",
      // p08 is q31's mass aggregate × a bounded epoch explode; p09 is
      // one feature scan into one multi-distinct 1-row aggregate — its
      // fingerprint distinct rides the same Expand as lang/source.
      "p08_curriculum_schedule", "p09_data_card",
      // Round-11 wave: t38 is a map-only two-transform sentence scan
      // (t19/t30's no-shuffle scan-floor band); p11 is p07's funnel with
      // token-mass sums (same window + source aggregate — must ride
      // p07's band); d27 is d06's banded pipeline plus ONE doc-keyed
      // membership join and a cluster-grain aggregate (d06's band);
      // s14 is s13's broadcast-probe scan into a ≤|labels|² rollup
      // (reads the k× embeddings twin — s13's band).
      "t38_sentence_profile", "p11_token_funnel", "d27_cluster_source_mix",
      "s14_knn_label_confusion",
      // Round-11 second wave: p12 rides t24's scoring scan into the
      // t17/t33 two-phase prefix machinery (the q35 hot-key hazard
      // avoided by construction); s15 is 4 map-only scans of the k×
      // embeddings twin + (k·dim)-key aggregates (corpus-independent
      // shuffle bytes); m12 is m06's banded self-join + d06's
      // size-adaptive component closure + two cluster-keyed aggregates.
      "p12_budget_fill", "s15_kmeans_cartography",
      "m12_media_neardup_clusters",
      // t39 is a map-only multi-regex scan into a bounded (source, band)
      // aggregate — the t19/t30 scan-floor band.
      "t39_readability_bands",
      // s16 is ONE posexplode pass over the k× embeddings twin into a
      // (wave, dim)-keyed map-side-combined aggregate — dim-bounded
      // everything after.
      "s16_embedding_drift",
      // t40's model tables are distinct-bigram-sized per source and the
      // tagged copies multiply the bigram vocabulary k× — the adversarial
      // direction for its (to, w1, w2)-keyed model joins (t13's axis).
      "t40_lm_transfer",
      // d28 rides d23's shingle-df aggregate (vocabulary-keyed, the
      // tagged copies grow the vocabulary k× — d23's adversarial axis)
      // split by wave.
      "d28_boilerplate_drift",
      // p13 composes d01's fingerprint window + d28's vocabulary
      // aggregate + s16's dim aggregate into three 1-row legs — output
      // one row at any scale. d01 itself is in the wave so the
      // composition check (p13 ≈ d01 + d28 + s16 + ε — legs SUM, they
      // don't multiply) can be read off one session's rows.
      "p13_ingest_audit", "d01_dedup_exact",
      // d30 is d29's chunk stream into ONE chunk-keyed aggregate (the
      // same vocabulary axis; output ∝ duplicated-chunk vocabulary);
      // m13 is the symbol-explode scan (m05's explode band) into a
      // (doc, symbol) aggregate bounded at ≤ 37 rows/doc; p14 is p07's
      // feature scan + the d01 fingerprint window into a ≤ sources×8
      // rollup; s17 is s15's Lloyd loop + one assignment scan + a
      // 32-row probe pass over the k× embeddings twin.
      "d30_hot_chunks", "m13_payload_entropy", "p14_gate_attribution",
      "s17_probe_traffic_balance",
      // d29's chunking is one typed flatMap (no per-token shuffle);
      // ownership is an associative min-struct aggregate over chunk
      // keys (vocabulary-keyed — the tagged copies grow the chunk
      // vocabulary k×, d23's adversarial axis) and the mark-kept join
      // is 1:1 per occurrence, so no df cap is needed: a corpus-hot
      // chunk collapses map-side instead of pairing quadratically.
      "d29_cdc_dedup",
      // Round-12 second wave: s18 is s15's Lloyd loop on the resident
      // 4/5 of the k× embeddings twin + ONE assignment scan over both
      // waves into a k-row conditional aggregate; t41 is t24's scoring
      // scan + t20's map-only gate scan, one doc-keyed join, and a
      // 9-way literal-grid explode into 9 groups (map-side combined);
      // p15 is two fingerprint-grain aggregates + one fp-keyed full
      // outer join (the d01 band) into a #sources rollup.
      "s18_cluster_population_drift", "t41_gate_threshold_curve",
      "p15_release_churn",
      // t42 rides the (source, word) vocabulary aggregate (d23's axis —
      // the tagged copies grow the word vocabulary k×) into a top-K
      // collapse; everything after is sources² × (K+1), corpus-
      // independent.
      "t42_source_divergence",
      // m14 composes m13's symbol explode + m06's banded signature
      // self-join + m09's prefix scan at doc-keyed joins — legs sum
      // (the p13 contract), nothing multiplies.
      "m14_media_pipeline",
      // Round-12 third wave: d31 rides d24's fingerprint window into
      // BIGINT micro-weight sums (output #sources, group sizes scale-
      // invariant under the tagged copies); p16 is p15's two
      // fingerprint-grain aggregates + one fp-keyed join + a ROLLUP
      // (the d01/p15 band); m15 is t17/m09's two-phase prefix scan +
      // m10's bounded interval explode into a window-keyed aggregate
      // (output ∝ tokens / 2048, grows k×); s19 is s15's Lloyd loop +
      // s01's broadcast-probe scan over the k× embeddings twin,
      // exploded ≤ 4× into bounded per-(level, query) rank windows
      // (s13/s17's band — the probe side stays 16 queries at any k).
      // q46 is events-keyed and rides the events axis below.
      "d31_soft_dedup", "p16_release_fingerprint", "m15_interleave_pack",
      "s19_nprobe_curve",
      // t43 composes the t21 trainer (vocabulary-sized iterations — the
      // tagged copies grow the vocabulary k×, its adversarial axis) with
      // t25's word-memoized encode and a ≤ sources × langs rollup.
      "t43_bpe_fertility",
      // p17 is t40's kernel (distinct-bigram model tables — the tagged
      // copies grow the bigram vocabulary k×, t40's adversarial axis)
      // plus #sources rows of decision arithmetic.
      "p17_mix_reweight",
      // d32: d02's signature machinery probed BIPARTITE (wave bands ×
      // resident bands); the tagged copies keep near-dups within-copy,
      // so candidates and verdict rows both scale k× — the d02 band
      // with a wave-proportional (1/7 corpus) probe side.
      "d32_incremental_neardup",
      // Round-13 curves: d33 is ONE capped-kernel pass at the largest cap
      // carrying per-pair min_df (the tagged copies grow vocabulary AND
      // candidate pairs k×); d34 is one banded candidate generation with
      // per-pair min colliding band + one verify + the truth kernel; d35
      // is three n-sweeps of the d09 bounded kernel. All three outputs
      // are pinned at 3 rows at any scale.
      "d33_cap_operating_curve", "d34_band_operating_curve",
      "d35_contam_ngram_curve",
      // s20: two Lloyd loops over one quantized checkpoint (each iters ×
      // one corpus scan into k long_vec_sum buffers) + k rows of driver
      // arithmetic; m16: one fp window + source attach + #sources rollup
      // (d01's band on the byte axis).
      "s20_codebook_retrain_shift", "m16_media_dedup_reclaim",
      // Round-14: d36 is five 1-row rollups of the session-memoized
      // kernel artifacts + one corpus fingerprint aggregate — the
      // measured wall is the MARGINAL (post-memo-build) cost, the
      // production release-report reading; m17 is one codegen'd byte
      // scan per payload (ascii_sym_hist) into a #sources rollup —
      // m13's band without the explode.
      "d36_release_dedup_report", "m17_symbol_source_profile",
      // p18 composes the memoized keep verdict (marginal) with one
      // doc-grain token scan into a #sources rollup — d07's band plus a
      // linear scan.
      "p18_dedup_token_ledger")
    def timeQuery(name: String, dir: String): (Double, Long) = {
      val fn = SparkEntry.queries(name)
      def once(): (Double, Long) = {
        spark.catalog.clearCache()
        // Checkpoint blocks from the PREVIOUS run free only after their
        // driver references are GC'd (ContextCleaner); at 100× two runs'
        // worth of live blocks can exceed the heap, so nudge the GC
        // between runs — outside the timed section.
        System.gc()
        val t0 = System.nanoTime()
        // Full materialization (Bench's noop sink), NOT count(): the
        // optimizer can eliminate a left join (and its whole subtree)
        // under count when the join adds no rows — which is exactly how
        // a 50× s17 overshoot hid behind a flat-looking count row in
        // round 13. The row count comes from a cheap second action over
        // the same plan, outside the timed section.
        val df = fn(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, df.count())
      }
      val (tA, rows) = once()
      val (tB, _) = once()
      (math.min(tA, tB), rows)
    }
    println(f"[scale] ${"query"}%-26s ${"1x sec"}%8s ${"rows"}%8s ${k + "x sec"}%8s ${"rows"}%9s ratio")
    (if (only.nonEmpty) names.filter(only) else names).foreach { name =>
      val (t1, r1) = timeQuery(name, sfDir)
      val (tK, rK) = timeQuery(name, outDir)
      println(f"[scale] $name%-26s $t1%8.2f $r1%8d $tK%8.2f $rK%9d ${tK / t1}%5.1fx")
    }
    // --------------- m11 plan-size crossover: inline literals vs one array
    // Same per-row arithmetic (|eval| xor+popcounts), different plan: the
    // inline path unrolls |eval| expression nodes (this corpus's eval slice
    // GROWS with k — at 100× it is ~26k nodes, the Janino-fallback regime),
    // the array path is one literal + a codegen'd loop. Banding is NOT an
    // alternative at Hamming radius 14/64 (pigeonhole → ≤4-bit bands → a
    // random pair still collides with p≈0.64) — the scan is the algorithm;
    // only the plan differs. Row-identity is spec-gated (OperatorSpec).
    // Runs in the full sweep OR targeted via the special name
    // "m11_variants".
    if (only.isEmpty || only("m11_variants")) {
      def m11Row(tag: String)(run: String => Long): Unit = {
        def minOf2(dir: String): (Double, Long) = {
          def once(): (Double, Long) = {
            spark.catalog.clearCache(); System.gc()
            val t0 = System.nanoTime(); val rows = run(dir)
            ((System.nanoTime() - t0) / 1e9, rows)
          }
          val (tA, r) = once(); val (tB, _) = once()
          (math.min(tA, tB), r)
        }
        val (t1, r1) = minOf2(sfDir)
        val (tK, rK) = minOf2(outDir)
        println(f"[scale] $tag%-26s $t1%8.2f $r1%8d $tK%8.2f $rK%9d ${tK / t1}%5.1fx")
      }
      m11Row("m11_inline_literals")(dir =>
        SparkEntry.queries("m11_media_decontaminate")(spark, dir).count())
      m11Row("m11_array_literal")(dir =>
        operators.Multimodal.mediaDecontaminateArray(
          operators.Multimodal.mediaTable(spark, dir), 14).count())
    }
    // ---------------- kilo axis (targeted only): three orders of magnitude
    // `only("kilo_axis")` with k=1000 builds a 5M-doc corpus via ONE
    // explode (a 1000-branch union would choke the planner; the
    // Column-replacement regexp_replace tags each copy's tokens, same
    // shingle-disjoint healthy-corpus construction as scaledDocs) and
    // times the flat document family at 1× vs k× — the spot check that
    // the flat band holds across THREE orders of magnitude.
    if (only("kilo_axis")) {
      val kDir = s"$outDir/kilo"
      val reuseKilo = reuseReq && {
        try spark.read.parquet(s"$kDir/documents.parquet").count() == n1 * k
        catch { case _: Exception => false }
      }
      if (!reuseKilo) {
        val stride = docs.agg(max("doc_id")).head().getLong(0) + 1L
        docs.select(col("doc_id"), col("text"), col("lang"), col("source"),
            col("n_chars"), explode(sequence(lit(0), lit(k - 1))).as("copy"))
          .select(
            (col("doc_id") + col("copy").cast("long") * lit(stride)).as("doc_id"),
            when(col("copy") === 0, col("text"))
              .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
                concat(lit("$1x"), col("copy").cast("string")))).as("text"),
            col("lang"), col("source"), col("n_chars"))
          .repartition(64)
          .write.mode("overwrite").parquet(s"$kDir/documents.parquet")
      }
      println(s"[scale] kilo corpus: ${n1 * k} docs")
      def kRow(name: String): Unit = {
        val fn = SparkEntry.queries(name)
        def minOf2(dir: String): (Double, Long) = {
          def once(): (Double, Long) = {
            spark.catalog.clearCache(); System.gc()
            // noop sink, not count() — see the doc-wave timer's comment.
            val t0 = System.nanoTime()
            val df = fn(spark, dir)
            df.write.format("noop").mode("overwrite").save()
            val dt = (System.nanoTime() - t0) / 1e9
            (dt, df.count())
          }
          val (tA, r0) = once(); val (tB, _) = once()
          (math.min(tA, tB), r0)
        }
        val (t1, r1) = minOf2(sfDir)
        val (tK, rK) = minOf2(kDir)
        println(f"[scale] $name%-26s $t1%8.2f $r1%8d $tK%8.2f $rK%9d ${tK / t1}%5.1fx")
      }
      Seq("t19_blocklist_scrub", "d01_dedup_exact", "d24_dup_inflation",
        "p06_dedup_mix_rates", "t17_sequence_pack", "q38_key_skew_profile",
        "p09_data_card").foreach(kRow)
      spark.stop(); return
    }

    // ------------------------- TPC-H fact axis: the relational family
    // Facts (orders/lineitem) scale k×; dimensions stay 1× — the star
    // schema's growth direction, and the regime where the broadcast
    // sides of q03–q05 must stay bounded while the fact scans grow.
    // Targeted via the special name "tpch_axis" or any member query name.
    val thNames = Seq("q01_scan_filter_project", "q02_agg_pricing_summary",
      "q03_join_orders_customer", "q04_broadcast_join_part",
      "q05_local_supplier_revenue", "q06_topk_customers",
      "q07_window_top_orders", "q08_distinct_parts_per_flag",
      "q09_semi_anti_join", "q10_rollup_order_status",
      "q15_approx_distinct",
      // q43 HERE is the FULL-RECOMPUTE BASELINE: the registered query
      // recomputes the resident leg from lineitem (so the oracle can
      // hash-check it self-contained), hence this row grows ~k× BY
      // CONSTRUCTION. The refresh claim itself — resident state read
      // from storage, one delta scan + #groups merge — is measured by
      // the dedicated q43_refresh row after this table (resident k×,
      // delta pinned, expected flat).
      "q43_incremental_agg",
      // q44: five independent anti-join audit legs — each one distinct +
      // left join + 1-row aggregate; facts grow k×, dimensions don't,
      // so every leg is a fact-scan-bounded shuffle with a fixed-size
      // output.
      "q44_referential_audit",
      // q47: the canonical fact-fact shuffle join (lineitem ⋈ orders,
      // both sides growing k×) into a ≤ priorities × 5 aggregate —
      // output pinned, cost is the join exchange, linear in facts.
      "q47_fulfillment_latency",
      // q48: the range-exchange prefix rank over k× orders (t33's
      // machinery on the money axis) + two segment-keyed aggregates —
      // output pinned at #segments; the adversarial claim is the rank
      // WITHOUT a corpus-partition window, at any k.
      "q48_spend_concentration")
    if (only.isEmpty || only("tpch_axis") || thNames.exists(only)) {
      val tDir = s"$outDir/tpch_axis"
      val reuseT = reuseReq && {
        try spark.read.parquet(s"$tDir/orders.parquet").count() ==
          graft.sources.Tables.orders(spark, sfDir).count() * k
        catch { case _: Exception => false }
      }
      if (!reuseT) scaledFacts(spark, sfDir, tDir, k)
      def thRow(name: String): Unit = {
        val fn = SparkEntry.queries(name)
        def minOf2(dir: String): (Double, Long) = {
          def once(): (Double, Long) = {
            spark.catalog.clearCache(); System.gc()
            // noop sink, not count() — see the doc-wave timer's comment.
            val t0 = System.nanoTime()
            val df = fn(spark, dir)
            df.write.format("noop").mode("overwrite").save()
            val dt = (System.nanoTime() - t0) / 1e9
            (dt, df.count())
          }
          val (tA, r0) = once(); val (tB, _) = once()
          (math.min(tA, tB), r0)
        }
        val (t1, r1) = minOf2(sfDir)
        val (tK, rK) = minOf2(tDir)
        println(f"[scale] $name%-26s $t1%8.2f $r1%8d $tK%8.2f $rK%9d ${tK / t1}%5.1fx")
      }
      (if (only.isEmpty || only("tpch_axis")) thNames
       else thNames.filter(only)).foreach(thRow)

      // q43's REFRESH path, benched as deployed (the thRow above is the
      // self-contained full-recompute form — it rescans the resident leg
      // by construction, so its k× ratio is a recompute baseline, not
      // the refresh claim). Here the resident partial state is
      // materialized to parquet UNTIMED (production reads it from
      // storage), the delta is pinned to the 1× slice, and the timed
      // path is Relational.refreshFromState: one delta scan + a
      // #groups merge. Resident 1× → k× with the SAME delta must be
      // ~flat — that is the resident-independence the q43 scaladoc
      // claims, now measured instead of inferred.
      if (only.isEmpty || only("tpch_axis") || only("q43_incremental_agg")) {
        import graft.sources.Tables
        def buildState(dir: String, out: String): Unit = {
          val li = Tables.lineitem(spark, dir)
          val split = li.agg(max("l_orderkey")).head().getLong(0) * 4 / 5
          li.filter(col("l_orderkey") < split)
            .groupBy("l_returnflag", "l_linestatus")
            .agg(sum(floor(col("l_quantity") * 100 + 0.5).cast("long")).as("qc"),
              count(lit(1)).as("c"))
            .write.mode("overwrite").parquet(out)
        }
        val li1 = Tables.lineitem(spark, sfDir)
        val split1 = li1.agg(max("l_orderkey")).head().getLong(0) * 4 / 5
        val delta1 = li1.filter(col("l_orderkey") >= split1).localCheckpoint()
        val nDelta = delta1.count()
        buildState(sfDir, s"$tDir/state_1x")
        buildState(tDir, s"$tDir/state_${k}x")
        def refreshOnce(statePath: String): Double = {
          spark.catalog.clearCache(); System.gc()
          val t0 = System.nanoTime()
          graft.operators.Relational.refreshFromState(
            spark.read.parquet(statePath), delta1).count()
          (System.nanoTime() - t0) / 1e9
        }
        def minOf2(p: String): Double = math.min(refreshOnce(p), refreshOnce(p))
        val t1 = minOf2(s"$tDir/state_1x")
        val tK = minOf2(s"$tDir/state_${k}x")
        println(f"[scale] q43_refresh(delta+merge)  $t1%8.2f $nDelta%8d $tK%8.2f $nDelta%9d ${tK / t1}%5.1fx" +
          f"  (resident 1x -> ${k}x, delta pinned; flat = resident-independent)")
      }
    }

    // ------------------------- events axis: the relational-event family
    // Every prior rehearsal scaled documents/embeddings only; this
    // section scales EVENTS (disjoint user populations, identical
    // behavior — growth by users) and measures the event-keyed family.
    // Runs in the full sweep OR targeted via the special name
    // "events_axis".
    val evNames = Seq("q11_events_hourly", "q12_sessionize",
      "q13_daily_active_users", "q29_funnel_conversion",
      "q30_cohort_retention", "q32_last_touch_attribution",
      "q33_event_transitions", "q39_rate_anomaly", "q40_wau_stickiness",
      // q16: probe (events) grows k×, build (orders) fixed; q17: the
      // honest quadratic — pair OUTPUT grows ~k² with event density
      // (the semantics, not the plan; the bucketed join must stay
      // output-bound).
      "q16_asof_join", "q17_range_join",
      // Round-11: q42 rides q12's ONE user-keyed session window into a
      // path-keyed aggregate — session count grows k× (disjoint user
      // populations), output fixed at 25 rows.
      "q42_session_paths",
      // q45 rides q37's user-keyed windows plus the as-of union window —
      // two user-keyed Exchanges, output = #purchases; the naive
      // intervals × purchases per-key product never materializes.
      "q45_point_in_time_enrich",
      // q46: ONE user-keyed min/max/count aggregate + a 1-row horizon
      // attach — output = #purchasing-users, grows k× with the disjoint
      // user populations while per-group state stays 5 BIGINTs.
      "q46_purchase_cadence",
      // q49: one user-keyed lag window over purchases (per-user history
      // is scale-invariant under the user-growth corpus) into a ≤4-row
      // band rollup — output pinned, cost is the user exchange.
      "q49_purchase_gap_bands")
    if (only.isEmpty || only("events_axis") || evNames.exists(only)) {
      val ev1 = graft.sources.Tables.events(spark, sfDir)
      val evDir = s"$outDir/events_axis"
      val reuseEv = reuseReq && {
        try spark.read.parquet(s"$evDir/events.parquet").count() == ev1.count() * k &&
          spark.read.parquet(s"$evDir/orders.parquet").count() > 0
        catch { case _: Exception => false }
      }
      if (!reuseEv) {
        scaledEvents(ev1, k).repartition(32)
          .write.mode("overwrite").parquet(s"$evDir/events.parquet")
        // q16's build side: orders stay 1× (history is fixed; the k−1
        // offset user populations have no orders and as-of to null —
        // the realistic new-user case).
        spark.read.parquet(s"$sfDir/orders.parquet")
          .write.mode("overwrite").parquet(s"$evDir/orders.parquet")
      }
      def evRow(name: String): Unit = {
        val fn = SparkEntry.queries(name)
        def minOf2(dir: String): (Double, Long) = {
          def once(): (Double, Long) = {
            spark.catalog.clearCache(); System.gc()
            // noop sink, not count() — see the doc-wave timer's comment.
            val t0 = System.nanoTime()
            val df = fn(spark, dir)
            df.write.format("noop").mode("overwrite").save()
            val dt = (System.nanoTime() - t0) / 1e9
            (dt, df.count())
          }
          val (tA, r0) = once(); val (tB, _) = once()
          (math.min(tA, tB), r0)
        }
        val (t1, r1) = minOf2(sfDir)
        val (tK, rK) = minOf2(evDir)
        println(f"[scale] $name%-26s $t1%8.2f $r1%8d $tK%8.2f $rK%9d ${tK / t1}%5.1fx")
      }
      (if (only.isEmpty || only("events_axis")) evNames
       else evNames.filter(only)).foreach(evRow)
    }
    if (only.nonEmpty) { spark.stop(); return }

    // ----------------------------------------------------- ANN family
    // k× embeddings corpus: copy i is vec_id-offset and elementwise
    // perturbed (deterministic sin ramp — copies are near but not equal,
    // so exact-tie artifacts can't mask ranking work). Queries stay the
    // original vec_id < nQ vectors in every run.
    //
    // The claim under test is the IVF scale story: brute force scores
    // every (query, corpus) pair, so its data-proportional cost grows
    // ~k×; the IVF probe reads only nProbe/nCells of the corpus via
    // partition pruning (mechanism asserted in PartitionPruningSpec), so
    // its wall must grow decisively slower than brute force. The index
    // BUILD is the amortized one-time linear pass and is timed separately.
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val vecStride = emb.agg(max("vec_id")).head().getLong(0) + 1L
    val nQ = 100; val topK = 10
    def embDir(mult: Int): String =
      if (mult == 1) sfDir else s"$outDir/emb${mult}x"
    val mults = Seq(1, 10, 100)
    mults.filter(_ > 1).foreach { m =>
      // Copy 0's perturbation is identically zero (sin(0) = 0), so the
      // query vectors (vec_id < nQ) are byte-identical at every scale.
      emb.select(col("vec_id"), col("embedding"), col("label"),
          explode(sequence(lit(0), lit(m - 1))).as("copy"))
        .select(
          (col("vec_id") + col("copy") * lit(vecStride)).as("vec_id"),
          expr("transform(embedding, (x, j) -> cast(x + 0.03 * sin(j * copy + copy) as float))")
            .as("embedding"),
          col("label"))
        // A real corpus at this volume is many files; without this the
        // explode writes ~1 file and every downstream scan runs 1 task,
        // which would measure parallelism loss, not data growth.
        .repartition(32)
        .write.mode("overwrite").parquet(s"${embDir(m)}/embeddings.parquet")
    }
    val e1 = emb.count()
    println(s"[scale] embeddings: ${e1} vecs at 1x, scaled to ${mults.filter(_ > 1).map(m => s"${e1 * m} (${m}x)").mkString(", ")}")

    def minOf2(f: => Long): (Double, Long) = {
      def once(): (Double, Long) = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (tA, rows) = once(); val (tB, _) = once()
      (math.min(tA, tB), rows)
    }
    println(f"[scale] ${"ann stage"}%-26s ${mults.map(m => f"${m + "x sec"}%8s").mkString} ratios")
    def annRow(name: String, run: String => Long): Unit = {
      val ts = mults.map(m => minOf2(run(embDir(m)))._1)
      val ratios = ts.tail.map(t => f"${t / ts.head}%.1fx").mkString(" ")
      println(f"[scale] $name%-26s ${ts.map(t => f"$t%8.2f").mkString} $ratios")
    }
    annRow("s01_brute_force", dir =>
      operators.Similarity.bruteForceTopK(spark, dir, nQ, topK).count())
    // Production IVF sizing: cells grow ~sqrt(N) with the corpus (nProbe
    // fixed), so the probed fraction nProbe/nCells SHRINKS as data grows —
    // that, plus partition pruning at the scan, is why the probe's wall
    // stays near-flat while brute force grows with the corpus.
    def cellsFor(m: Int): Int = 16 * math.sqrt(m.toDouble).round.toInt
    mults.foreach { m =>
      spark.catalog.clearCache()
      val tag = s"ivf_index_build_${m}x"
      val t0 = System.nanoTime()
      operators.Similarity.ivfWriteIndex(spark, embDir(m), s"$outDir/ivf_idx_${m}x",
        nCells = cellsFor(m))
      println(f"[scale] $tag%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s (one-time, linear; ${cellsFor(m)} cells)")
    }
    annRow("s04_ivf_probe", dir => {
      val m = mults.find(embDir(_) == dir).get
      operators.Similarity.ivfProbeIndex(spark, dir, s"$outDir/ivf_idx_${m}x", nQ, topK).count()
    })
    // PQ-ADC + exact rerank (s08): train+encode+scan every run (the
    // un-amortized worst case — a deployment trains once and re-encodes
    // incrementally). The scale claim is the SCAN: a corpus row costs m=8
    // byte-lookups instead of dim float-mults, and only queries × rerank×k
    // raw vectors are ever re-read, so wall must grow well under the
    // corpus ratio even with training folded in.
    annRow("s08_pq_adc_rerank", dir =>
      operators.Similarity.pqTopK(spark, dir, nQ, topK).count())

    // Work accounting — the scale-deterministic quantities wall-clock can't
    // show at toy sizes (fixed overhead dominates both methods here):
    //  - scanned: corpus rows the probe reads after partition pruning
    //    (union of the nQ queries' probed cells) vs the full corpus for
    //    brute force;
    //  - pairs: (query, vector) similarity evaluations = the O(·) term
    //    that rules at 100 TB. Brute force is nQ x N by definition.
    println(f"[scale] ${"ann work (exact counts)"}%-26s ${"corpus N"}%10s ${"scanned"}%10s ${"1q scan"}%10s ${"pairs"}%12s ${"brute pairs"}%12s")
    mults.foreach { m =>
      val idx = s"$outDir/ivf_idx_${m}x"
      val q = operators.Similarity
        .ivfProbeQueries(spark, embDir(m), idx, nQ, 4)
        .select("cell", "query_id").localCheckpoint()
      val corpus = spark.read.parquet(idx)
      val n = corpus.count()
      val scanned = corpus
        .join(q.select("cell").distinct(), Seq("cell")).count()
      val pairs = corpus.join(q, Seq("cell")).count()
      // Serving-path read: ONE query prunes to its nProbe cells — the
      // batch union above covers most cells at nQ=100 and hides this.
      val scanned1 = corpus.join(
        q.filter(col("query_id") === 0).select("cell").distinct(), Seq("cell")).count()
      val tag = s"ivf_probe_${m}x"
      println(f"[scale] $tag%-26s $n%10d $scanned%10d $scanned1%10d $pairs%12d ${nQ.toLong * n}%12d")
    }

    // ------------------------------------------- d17 decontamination at k×
    // Verbatim copies under offset ids (scaledVecs): the exact scaling law
    // flagged(k×) = k·flagged(1×) + (k−1)·|eval| (ScaleLinearitySpec gates
    // it at 3×); here the k× wall ratios of BOTH paths are the evidence —
    // the literal-inline scan must ride the scan-cost floor (t19's
    // control-row regime) and the cell-bucketed scale path must stay
    // block-bounded while emitting identical rows.
    def d17Row(tag: String, nEval: Int)(run: String => Long): Unit = {
      def minOf2(dir: String): (Double, Long) = {
        def once(): (Double, Long) = {
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val rows = run(dir)
          ((System.nanoTime() - t0) / 1e9, rows)
        }
        val (tA, r) = once(); val (tB, _) = once()
        (math.min(tA, tB), r)
      }
      val (t1, r1) = minOf2(sfDir)
      val (tK, rK) = minOf2(outDir)
      // nEval < 0: caller's row-count law doesn't apply (m11 section).
      val law = if (nEval >= 0)
        s" (law: ${k}*$r1+${(k - 1) * nEval} = ${k * r1 + (k - 1) * nEval})"
      else ""
      println(f"[scale] $tag%-26s $t1%8.2f $r1%8d $tK%8.2f $rK%9d ${tK / t1}%5.1fx" + law)
    }
    d17Row("d17_exact_inline", 25)(dir =>
      SparkEntry.queries("d17_embedding_decontaminate")(spark, dir).count())
    d17Row("d17_bucketed_path", 25)(dir =>
      operators.Dedup.embeddingDecontaminateBucketed(
        spark.read.parquet(s"$dir/embeddings.parquet"), 25, 0.35)._1.count())
    // Eval-size crossover: the inline scan's per-row cost is |eval|
    // vec_dots (it grows WITH the eval set), the bucketed path's verify
    // join touches only admitted (corpus-cell, eval-cell) blocks. 10× the
    // eval set (250) measures the axis the bucketed path exists for —
    // p03's inlineEvalBound gate switches between these same two legs.
    Seq(250).foreach { ne =>
      d17Row(s"d17_inline_ev$ne", ne)(dir =>
        operators.Dedup.embeddingDecontaminateFrom(
          spark.read.parquet(s"$dir/embeddings.parquet")
            .select(col("vec_id"), col("embedding")), ne, 0.35).count())
      d17Row(s"d17_bucketed_ev$ne", ne)(dir =>
        operators.Dedup.embeddingDecontaminateBucketed(
          spark.read.parquet(s"$dir/embeddings.parquet"), ne, 0.35)._1.count())
    }

    // --------------------- s07 lifecycle at 10×: build→append→probe→compact
    // The cycle a continuously-ingesting ANN index lives, on the 10×
    // sin-perturbed corpus (exact ties can't mask ranking work): resident
    // 90% indexed, the newest copy appended as the delta, probed, then
    // compacted and probed again. Row-identity across compaction is
    // spec-gated at sf0.001 (PartitionPruningSpec); here the evidence is
    // wall per stage, the file-count collapse, and recall holding at 10×.
    {
      val dir10 = embDir(10)
      val kxe = spark.read.parquet(s"$dir10/embeddings.parquet")
        .select(col("vec_id").as("vec_id"), col("embedding"))
      val cut = 9L * vecStride // copies 0-8 resident, copy 9 = the delta
      val idx = s"$outDir/ivf_idx_lifecycle"
      def timed[A](tag: String)(f: => A): A = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); val r = f
        println(f"[scale] $tag%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
      }
      timed("s07_build_resident")(operators.Similarity.ivfWriteIndexOf(
        spark, kxe.filter(col("vec_id") < cut), idx, nCells = cellsFor(10)))
      timed("s07_append_delta")(operators.Similarity.ivfAppendIndex(
        spark, kxe.filter(col("vec_id") >= cut), idx))
      def nFiles: Int = {
        def walk(f: java.io.File): Int =
          if (f.isDirectory) f.listFiles().map(walk).sum
          else if (f.getName.endsWith(".parquet")) 1 else 0
        walk(new java.io.File(idx))
      }
      val pre = timed("s07_probe_post_append")(
        operators.Similarity.ivfProbeIndex(spark, dir10, idx, nQ, topK).collect())
      val filesBefore = nFiles
      timed("s07_compact")(operators.Similarity.ivfCompactIndex(spark, idx))
      val filesAfter = nFiles
      val post = timed("s07_probe_post_compact")(
        operators.Similarity.ivfProbeIndex(spark, dir10, idx, nQ, topK).collect())
      require(pre.map(_.toString).sorted.toSeq == post.map(_.toString).sorted.toSeq,
        "probe drift across compaction")
      val exact = operators.Similarity.bruteForceTopKFrom(kxe, nQ, topK)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = post.map(r => (r.getLong(0), r.getLong(1))).toSet
      val rec = exact.count(got.contains).toDouble / exact.size
      println(f"[scale] s07_lifecycle_recall@$topK%-6d $rec%8.4f" +
        s" (files $filesBefore -> $filesAfter, probe rows identical across compact)")
    }
    spark.stop()
  }
}

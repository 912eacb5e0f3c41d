package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{AsOfJoin, Dedup, Multimodal, Pipeline, RangeJoin, Relational, Sampling, Similarity, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory (SURVEY.md §2 generalized + training-data-pipeline
  * extensions):
  *  - q01..q15: relational operator inventory (scan/filter/project, agg,
  *    shuffle/broadcast/multi joins, top-k, window, distinct, semi/anti,
  *    rollup, events windowed agg, sessionize, DAU, JSON props, HLL).
  *  - q16/q17: as-of join, binned range (time-proximity) join.
  *  - q18..q21: set ops, cube/grouping_id, percentiles, pivot.
  *  - q22: stream-static enrichment (batch twin of EventStreams.enriched).
  *  - q23/q24: deterministic md5-bucket sampling (uniform, stratified).
  *  - q25/q26: latest-record compaction (max_by), full-outer coverage join.
  *  - q27: sketch percentiles (percentile_approx next to q20's exact).
  *  - q28: weighted corpus mixing (deterministic fractional replication).
  *  - q29/q30: funnel conversion (ordered within-user sequence matching
  *    via a running-max window; no events self-join), weekly cohort
  *    retention (user-keyed first-seen window + distinct actives).
  *  - q31: temperature-balanced source mixing (mT5-style α=0.5) — rates
  *    derived from measured per-source token mass, md5-bucket decisions.
  *  - q32: last-touch attribution — per-purchase attributed click via a
  *    user-keyed running struct-max window (no events self-join).
  *  - q36: arbitrary GROUPING SETS (non-hierarchical levels — the
  *    complement of q10's ROLLUP and q19's CUBE) in one Expand pass.
  *  - q37: SCD2 history intervals — event stream → versioned validity
  *    ranges per user (runs collapsed, far-future open sentinel), the
  *    temporal complement of q25's latest-snapshot compaction.
  *  - q38: join/shuffle-key skew profile — per-key share, ratio to the
  *    hottest key, and the is_hot salting signal.
  *  - q39: ingestion-rate anomaly detection — per-(type, hour) z-score
  *    against the trailing 24 observations, from order-independent
  *    BIGINT window sums.
  *  - q40: rolling-engagement stickiness — exact DAU / trailing WAU /
  *    MAU / DAU-over-MAU per day via a bounded window-end explode of
  *    the distinct (user, day) grain (sliding COUNT DISTINCT without
  *    a per-day rescan or a day self-join).
  *  - q41: conversion-latency distribution — first-view → first
  *    qualifying-purchase latency per user, bucketed into operational
  *    bands plus the no-conversion band (the evidence behind q32's
  *    attribution-window choice), in one user-keyed window pass.
  *  - q42: top session event-type paths — q12's sessionization rolled up
  *    to the whole-walk grain (first ≤8 events per session), the
  *    behavioral complement of q33's per-step transitions.
  *  - q43: incremental materialized-view maintenance — q02's pricing
  *    summary refreshed by a delta-proportional scan + a #groups-sized
  *    partial-state merge, in centi-unit BIGINTs so the merge is
  *    associative and the view can NEVER drift from its own definition;
  *    the oracle is the full recompute, so the hash equality is the
  *    merge-≡-recompute theorem itself.
  *  - q44: referential-integrity + participation audit — five anti-join
  *    legs over the warehouse's foreign keys, each one distinct + left
  *    join + 1-row aggregate.
  *  - q45: point-in-time-correct enrichment — every purchase joined to
  *    the user's SCD2 state valid AT purchase time via the shared as-of
  *    kernel (the feature-store primitive; no intervals × probes
  *    product ever materializes).
  *  - q46: per-user purchase cadence + at-risk banding — the telescoped
  *    mean-gap identity (min/max/count, NO lag window) closed by a
  *    division-free compare of idle time against the user's own cadence;
  *    the per-user state triple is associative, so the cadence table is
  *    also a MAINTAINED VIEW (ViewStreams.maintainCadenceView, the
  *    second view on q43's generation-numbered merge protocol).
  *  - q47: order-fulfillment latency bands per priority — the canonical
  *    fact-fact shuffle join banded on integer day lag, including the
  *    pre_order impossible-latency band (q44's data-quality stance on
  *    the temporal axis).
  *  - q48: order-spend concentration per market segment — EXACT Gini +
  *    top-decile share, with per-segment ranks from the range-exchange
  *    prefix scan (a PARTITION BY segment rank window is the banned
  *    corpus-window shape sharded #segments ways) and Σ(rank·cents) in
  *    DECIMAL(38,0) so exactness survives past the BIGINT horizon.
  *  - q49: inter-purchase gap distribution in operational bands — q46's
  *    corpus-level companion (q46 gives each user's mean cadence; this
  *    is the gap histogram a retention team plots), one user-keyed lag
  *    window + a ≤4-row band rollup.
  *  - t01..t43: text query library (grep, wordcount, token counting,
  *    quality scoring, language-ID, fingerprinting, winnowing, TF-IDF,
  *    langid eval, context chunking, co-occurrence PMI, bigram LM,
  *    bigram perplexity quality filter, vocabulary growth, Gopher-style
  *    repetition filter, per-doc shingle novelty, training sequence
  *    packing, token frequency spectrum, blocklist scrub, quality-gate
  *    cascade with per-rule flag bits, BPE merge-rule training,
  *    per-(source, lang) corpus profile, sketch-then-verify heavy
  *    hitters, hashed-linear-model quality scoring, BPE corpus encoding
  *    with the trained merge table, Unicode NFC normalization audit via
  *    the native nfc_norm expression, DSIR-style hashed-unigram
  *    importance weighting with a corpus-learned bucket model,
  *    MAD-based length-outlier detection, per-doc token entropy,
  *    PII detection/redaction with category counts over a deterministic
  *    contact-footer corpus, encoding-hygiene audit — U+FFFD / control
  *    chars / ASCII fraction with repaired-text digest, per-source
  *    Zipf-law slope fit via order-independent quantized regression,
  *    deterministic seeded epoch shuffle — global rank with no global
  *    window via the two-phase prefix scan, per-doc templated-ness
  *    score over the corpus-hot shingle vocabulary, declared-vs-detected
  *    language confusion audit — the metadata-trust readout,
  *    classifier-vs-gate calibration — the threshold-picking table,
  *    vocabulary-coverage / OOV audit against the corpus's own top-K
  *    reference vocab — the "will my tokenizer cover this doc" triage,
  *    per-document sentence profile — counts, mean/max sentence tokens
  *    and the run-on fraction, the sentence axis token-level gates miss,
  *    per-source readability banding — Flesch-Kincaid-style grades in
  *    exact micro-units, the difficulty axis p08's curriculum orders by,
  *    cross-source LM transfer matrix — each source's bigram stream
  *    scored under every other's Laplace bigram LM in exact micro-nats,
  *    the model-likelihood answer to "are these sources interchangeable"
  *    that d20's n-gram overlap can't give for paraphrased twins,
  *    classifier-threshold operating curve — per candidate τ the
  *    surviving doc/token budget and the confusion cells against the
  *    t20 gate, the table that PICKS the deployed cutoff,
  *    cross-source divergence matrix — pairwise KL over the corpus's
  *    own top-K vocabulary + OOV mass in exact nano-nat units,
  *    tokenizer fertility per (source, lang) under the t21-trained
  *    merge table — the deployment metric that completes the
  *    train/encode/measure tokenizer triple).
  *  - d01..d36: dedup & corpus hygiene (exact, MinHash-LSH, SimHash,
  *    n-gram Jaccard, embedding-cosine, connected-component clusters,
  *    keep-list, near-dup triangles, benchmark decontamination,
  *    incremental delta dedup, exact-substring repeated spans, near-dup
  *    detector consensus, C4-style chunk scrub + reassembly,
  *    SemDeDup-style bucket-local semantic dedup, quality-aware cluster
  *    representative selection, duplicate-provenance source matrix,
  *    embedding-space eval-set decontamination — d09's semantic
  *    complement, one map-only scan with literal-inlined eval vectors,
  *    asymmetric containment near-dup pairs, eval-side leak report,
  *    cross-source n-gram duplication matrix, train/validation
  *    split-leakage audit over the engine's own md5-bucket split,
  *    MinHash sketch calibration — estimated vs exact Jaccard,
  *    corpus boilerplate report — the hot-shingle vocabulary behind the
  *    d04/d18 df-cap with per-shingle source spread, per-source
  *    exact-dup inflation factors, exact-dup cluster-size spectrum —
  *    the duplication-shape histogram behind d24's rates, corpus
  *    template scrub — the APPLY step for d23's hot vocabulary, d13's
  *    report→edit relationship on the n-gram axis, near-dup clusters at
  *    cluster grain with their source composition — the per-cluster
  *    triage row between d16's pairwise matrix and d25's histogram,
  *    boilerplate DRIFT between the resident corpus and the newest
  *    ingest wave — the new-template tripwire that re-arms d26's scrub
  *    vocabulary and the d04/d18 df-cap, s16's stance on the text axis;
  *    content-defined chunk dedup — FastCDC boundaries on the token
  *    stream that RESYNCHRONIZE within ~g tokens of an edit, closing
  *    d13's fixed-grid misalignment; hot-chunk provenance — the
  *    actionable scrub list at d29's edit grain with chunk text and
  *    occurrence/document/source counts; soft deduplication — exact
  *    integer micro-weights 10⁶ div cluster-size at d01's fingerprint
  *    grain, the keep-but-downweight alternative whose per-source
  *    effective mass restores the cross-source contribution hard keeper
  *    attribution destroys; the incremental NEAR-dup admission gate —
  *    d10's daily-delta move on d02's MinHash-LSH axis, wave bands
  *    probed bipartite against resident bands only, per-wave-doc
  *    verdict with best resident match — the gate that bounces the
  *    re-crawl-with-new-footer the exact gate structurally misses;
  *    the df-cap operating curve — candidate volume vs emitted pairs at
  *    cap ∈ {8, 64, 256}, the evidence behind ShingleDfCap made
  *    queryable; the LSH banding operating curve — candidates, verified
  *    pairs, and recall against the capped-exact truth at nBands ∈
  *    {4, 8, 16}, s19's measurement discipline on the document axis;
  *    the decontamination n-gram sensitivity curve — qualified pairs,
  *    contaminated docs, and burned evals at n ∈ {3, 5, 8} over the
  *    d09/d19 kernel, the evidence for choosing the match-strictness n
  *    per corpus; the one-row release dedup report — corpus size,
  *    exact-dup and verified-pair and cluster mass, final keep count,
  *    every number a 1-row rollup of the session-memoized kernel
  *    artifacts, the release-gate readout the memo exists for).
  *  - s01..s20: similarity search (brute-force ANN, LSH-bucketed ANN,
  *    per-label centroid stats, IVF ANN, recall@k evaluation, int8
  *    quantization error audit, incremental IVF ingest serving state,
  *    PQ-ADC with exact rerank, exact cosine radius search, MMR
  *    diversity re-ranking of the retrieval shortlist, metadata-filtered
  *    ANN, tombstone-delete serving state — the index lifecycle's third
  *    verb: delete is one O(|deletes|) side-table write, probes mask at
  *    read time, compaction folds and resets; kNN label-purity audit —
  *    the embedding-space label-noise triage list; kNN label CONFUSION
  *    matrix — which labels blur together in embedding space, the
  *    relabel-vs-merge decision table; spherical k-means corpus
  *    cartography — the unsupervised "what is actually in this corpus"
  *    map with per-cluster size/label-purity/tightness, exact across
  *    engines via integer-milli vectors and division-free sum-vector
  *    centroids; per-dimension embedding drift between the resident
  *    corpus and the newest ingest wave — the encoder-change tripwire
  *    an ANN stack checks before folding a delta in; probe-traffic vs
  *    storage balance of the routing codebook — the serving-load audit
  *    that catches cells balanced in storage but hot in traffic;
  *    cluster-population drift of the newest wave under the FROZEN
  *    resident-trained codebook — the rebalance trigger read before
  *    retraining; the codebook RETRAIN shift — per cell, the cosine
  *    between the frozen resident-trained centroid and a full-retrain
  *    centroid, the geometric follow-up to the population-drift signal
  *    (a shifted population whose centroid barely moves needs no
  *    retrain); the nprobe operating curve — exact recall@k and
  *    scanned-fraction per candidate nprobe over the integer-milli
  *    codebook, the first oracle-exact IVF quality curve, with the
  *    nprobe=k row as its built-in brute-force proof anchor).
  *  - m01..m17: multimodal binary-column plumbing (metadata, stub-decode
  *    features, frame sampling, strided resize, windowed frame energy,
  *    perceptual-hash near-dup pairs, scene-change detection over frame
  *    energies, VAD-style voiced-segment runs, WebDataset-style
  *    shard-manifest packing on the byte axis, per-shard fill/integrity
  *    audit of that manifest, perceptual-hash eval-set decontamination
  *    — d17's literal-inline stance on the media axis; media near-dup
  *    CLUSTERS — m06's pairs closed into components with size/edge/
  *    worst-Hamming readout, the d06→d27 move on the perceptual axis;
  *    pre-decode payload entropy gate in exact micro-nats with the
  *    corpus's flattest assets as the review queue; the composed media
  *    pipeline — entropy gate → near-dup drop → shard repack in one
  *    manifest; interleaved multimodal sample packing — text tokens +
  *    fixed media slots packed into training windows with per-window
  *    modality-mix and fill audits, the OBELICS-style loader layout;
  *    exact media-payload dedup reclaim per source — content-addressed
  *    bytes_raw vs bytes_stored with min-doc_id keeper attribution, also
  *    maintained incrementally as the fourth streaming view; per-source
  *    symbol-class profile over the codegen'd 37-bin payload histogram —
  *    letter/digit/space mass and letter fraction, the pre-decode feed
  *    audit; binaryFile ingest in Multimodal).
  *  - p01: the composed curation pipeline (gate → dedup-among-survivors →
  *    sequence packing) emitting every document's final disposition and
  *    packed window range — the lineage record of a training-data run.
  *  - p02: the composed mix-assembly pipeline (measure per-source token
  *    mass → q31 temperature rates → deterministic md5-bucket sampling →
  *    t17 sequence packing) — the mix manifest of a pretraining run.
  *  - p03: the composed pre-release contamination audit (d09 token-space
  *    + d17 embedding-space vs one held-out eval set + t19 blocklist),
  *    per-doc evidence + WHY bitmask + releasable verdict.
  *  - p04: the composed epoch-assembly manifest (d01 dedup keep → t33
  *    seeded permutation → t17 packing over the SHUFFLED stream) — the
  *    range-sliceable record a loader materializes an epoch from.
  *  - p05: the incremental refresh manifest (wave-vs-resident exact
  *    dedup → packing that CONTINUES the resident token cursor) — the
  *    append-only delta a crawl refresh ships without repacking.
  *  - p06: mix rebalance after dedup — q31's temperature rates from raw
  *    AND post-d01 source masses with the per-source shift (dedup moves
  *    masses; weights derived before it are wrong for the corpus that
  *    actually trains).
  *  - p07: per-source stage-attrition funnel (raw → blocklist-clean →
  *    quality gate → dedup representative, cumulative) — the "where
  *    does my data go" dashboard of a curation run.
  *  - p08: epoch-annealed curriculum schedule — q31's temperature rates
  *    for every training epoch under a halving-α annealing chain (each
  *    rate a sqrt chain of the exact token ratio, engine-exact).
  *  - p09: the dataset data card — corpus size, token mass, diversity,
  *    dup/gate/blocklist rates as (metric, value) rows from ONE scan
  *    and ONE multi-distinct aggregate, using the engine's own
  *    definitions (d01 fingerprint, t20 gate, t19 blocklist).
  *  - p10: the epoch seed-reproducibility audit — t33's permutation under
  *    two seeds over the d01-kept corpus, verified per source: document
  *    set and token mass seed-invariant (set_equal), order genuinely
  *    moved (frac_moved, mean/max |Δposition|) — the pre-flight
  *    determinism table a run checks before burning compute.
  *  - p11: p07's survival funnel in TOKEN terms — per-source token mass
  *    through raw → clean → gate → dedup representative, the unit the
  *    mixing weights (q31/p06/p08) actually sample.
  *  - p12: quality-sorted token-budget fill — per source, admit documents
  *    best-first by t24's score (shared kernel) until 25% of the raw
  *    token mass is spent; the FineWeb-style SELECTION step that decides
  *    WHICH documents carry the contribution the mixing queries size.
  *  - p13: the composed ingest-readiness audit — ONE verdict row before
  *    a daily delta folds in: d01-fingerprint dup rate, d28's major
  *    emerging templates, s16's worst embedding drift, and the
  *    fold_in_ready conjunction; p03's release-audit stance pointed at
  *    the pipeline's intake end.
  *  - p14: order-independent gate attribution — p07's three gates as
  *    independent predicates with exclusive inclusion-exclusion combo
  *    counts, the readout a sequential funnel structurally cannot give.
  *  - p15: release-to-release churn ledger — the per-source diff of two
  *    complete release manifests at d01's fingerprint grain, including
  *    REMOVALS, with a cross-multiplied fair-share heavy_churn flag.
  *  - p16: the release content-fingerprint manifest — per source + the
  *    __ALL__ corpus row, an order-independent 60-bit XOR digest of the
  *    content-fingerprint set with doc/content/token counts in one
  *    ROLLUP; the O(#sources) freeze stamp compared BEFORE p15's diff.
  *  - p18: the per-source dedup TOKEN ledger — raw vs kept word-token
  *    mass and reclaim fraction under d07's keep verdict (the unit a
  *    mixing decision actually budgets in; m16's byte reclaim on the
  *    text/token axis), the keep bit read from the session-memoized
  *    kernel, tokenization t03's oracle-exact word tokens.
  *  - p17: DoReMi-style mix reweighting — one exponentiated-gradient
  *    step over t40's novelty signal (mean transfer gap vs every other
  *    source's bigram LM): w′(s) ∝ share(s)·exp(η·novelty(s)),
  *    nano-quantized before the exact normalizing sum, so the published
  *    mix is reduce-order-proof; the query that turns the measurement
  *    matrix into the mixing DECISION.
  */
object SparkEntry {
  val inventory: Seq[Q] =
    Relational.all ++ TextOps.all ++ Dedup.all ++ Similarity.all ++
      Multimodal.all ++ Sampling.all ++ Pipeline.all ++
      Seq(AsOfJoin.q16, RangeJoin.q17)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q05.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.queries(inventory)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracles(inventory)
}

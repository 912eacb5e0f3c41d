package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Structured Streaming surface (an extension beyond the reference, which is
  * batch-only — SURVEY.md §1): the `events` table treated as a stream.
  *
  * Shapes provided:
  *  - watermarked tumbling-window aggregation (the streaming twin of batch
  *    query q11_events_hourly),
  *  - stateful per-user sessionization via flatMapGroupsWithState (the
  *    streaming twin of q12_sessionize),
  *  - stateful per-user funnel conversion via mapGroupsWithState (the
  *    streaming twin of q29_funnel_conversion).
  *
  * At scale these run identically on Kafka/file sources — state is
  * hash-partitioned by key in the state store, watermarks bound state size.
  */
object EventStreams {

  /** Events as a file stream (schema pinned from the batch table).
    *
    * FileStreamSource requires a directory; the testdata table is a single
    * parquet file, so it is staged into a temp dir (in production the source
    * would be a landing directory or Kafka topic already). The nanos-long
    * `ts` (see Tables.events) is converted to a µs timestamp for
    * watermarking.
    */
  def readEventStream(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get(s"$sfDir/events.parquet")
    val dir =
      if (Files.isDirectory(src)) src
      else {
        val d = Files.createTempDirectory("graft-events-stream")
        Files.copy(src, d.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
        d
      }
    val schema = spark.read.parquet(src.toString).schema
    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }

  /** Watermarked 1-hour tumbling window counts per event_type. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(
        col("window.start").as("hour"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Watermarked daily ACTIVE-USER counts via the mergeable HLL sketch —
    * the streaming form of q13's distinct and the 100 TB streaming-DAU
    * answer: exact distinct state grows with |users|, while the sketch
    * holds a fixed-size register array per window whatever the cardinality.
    * The claim worth a spec: HLL merge is ORDER-INDEPENDENT (max per
    * register), so the streamed sketch equals the batch sketch over the
    * same rows BIT-FOR-BIT — not approximately, identically — however the
    * micro-batches sliced the stream. That merge-ability is exactly what
    * q40's batch explode buys back for exact counts; here it is native to
    * the sketch. rsd 0.02 matches q15's convention. */
  def dailyActiveApprox(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 days")
      .groupBy(window(col("ts"), "1 day"))
      .agg(
        approx_count_distinct("user_id", 0.02).as("approx_users"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("day"), col("approx_users"), col("n_events"))

  /** Run a streaming query to completion against the (finite) file source,
    * materializing results into an in-memory table; returns the table name. */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): StreamingQuery = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q
  }

  /** Streaming deduplication: drop events with a duplicate (user_id,
    * event_type, value) signature arriving within the watermark horizon —
    * the streaming form of exact dedup (d01). State is bounded by the
    * watermark: Spark evicts seen-keys older than it, so state size is
    * O(arrival rate × horizon), not O(stream length) — the property that
    * makes streaming dedup feasible at 100 TB/day. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "value")

  /** Per-type ingest-rate profile from the RESIDENT corpus: observation
    * count and BIGINT Σ/Σ² over its hourly (event_type, hour) counts —
    * the frozen model `rateAnomalyGate` scores arrivals against (m13's
    * frozen-cutoff / s15's frozen-codebook stance on the rate axis).
    * Output is #event-types rows; rebuilding it is one batch aggregate
    * whenever the resident corpus rolls forward. */
  def rateProfile(batchEvents: DataFrame): DataFrame =
    batchEvents
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_base"),
        sum("n_events").as("s1"),
        sum(col("n_events") * col("n_events")).as("s2"))

  /** Streaming ingest-rate anomaly gate — the at-the-edge twin of batch
    * q39: every watermark-closed hourly (event_type, window) count is
    * z-scored against the frozen per-type profile THROUGH THE SAME
    * `Relational.rateZExpr` column expression the batch monitor closes
    * with (shared code path, so stream ≡ batch needs no scalar mirror),
    * and flagged at the same rounded |z| ≥ 3 line. The deliberate model
    * difference, stated: q39's baseline TRAILS (the last 24 observations
    * of the same type — a backfill-order artifact streaming cannot
    * replay); the gate's baseline is the resident profile, frozen at
    * deploy time — scoring a feed doubling overnight BEFORE it poisons
    * q31's mixing weights is exactly the frozen model's job, and the
    * profile refresh rides the resident corpus roll, not the stream.
    *
    * Scale shape: one watermarked windowed count (state bounded by the
    * 2 h horizon × #types), then a stream–static join against a
    * #types-row profile — broadcast, no stream-side shuffle beyond the
    * windowed aggregate's own. */
  def rateAnomalyGate(events: DataFrame, profile: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"))
      .join(broadcast(profile), Seq("event_type"), "left")
      .withColumn("z", expr(graft.operators.Relational.rateZExpr))
      .withColumn("is_spike", coalesce(abs(col("z")) >= 3.0, lit(false)))
      .select("hour", "event_type", "n_events", "n_base", "z", "is_spike")

  /** Stream–static enrichment: the event stream joined to the (batch)
    * customer→nation dimension chain, then aggregated per watermarked
    * 1-hour window × nation. The static side is broadcast to every task —
    * no stream-side shuffle for the join, and dimension refresh is just
    * re-reading the batch table per micro-batch (Spark re-plans static
    * sides each trigger). This is the streaming twin of batch q22.
    */
  def enriched(spark: SparkSession, events: DataFrame, sfDir: String): DataFrame = {
    import graft.sources.Tables
    val dims = broadcast(
      Tables.customer(spark, sfDir)
        .join(broadcast(Tables.nation(spark, sfDir)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name")))
    events
      .withWatermark("ts", "2 hours")
      .join(dims, col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour"), col("n_name"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(
        col("window.start").as("hour"),
        col("n_name"), col("n_events"), col("total_value"))
  }

  /** Run a streaming query to completion into a parquet directory with a
    * checkpoint — the production sink shape: the checkpoint's write-ahead
    * log makes the file sink exactly-once (a re-run resumes from the last
    * committed batch instead of duplicating output). Returns the output dir.
    */
  def runToParquet(df: DataFrame, outDir: String, checkpointDir: String): Unit = {
    val q = df.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Batch form of [[enriched]] (same hourly window × nation aggregate over
    * the static table) — the equivalence target for the streaming spec. */
  def enrichedBatchTwin(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.Tables
    Tables.events(spark, sfDir)
      .join(broadcast(Tables.customer(spark, sfDir)), col("user_id") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(window(col("ts"), "1 hour"), col("n_name"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(
        col("window.start").as("hour"),
        col("n_name"), col("n_events"), col("total_value"))
  }

  // ------------------------------------------------ latest-record snapshot
  final case class SnapEv(
      user_id: Long, event_type: String, event_id: Long,
      ts: java.sql.Timestamp, value: Double)
  final case class SnapState(
      event_id: Long, tsMicros: Long, value: Double, version: Long)
  final case class SnapOut(
      user_id: Long, event_type: String, last_event_id: Long,
      last_ts_micros: Long, last_value: Double, version: Long)

  /** Streaming latest-record compaction — the streaming twin of batch q25
    * (SCD-1 / upsert materialization): per (user_id, event_type), keep the
    * most recent event, ties on ts broken by event_id exactly as the batch
    * `max_by(…, struct(ts, event_id))`. `mapGroupsWithState` emits the
    * current snapshot each micro-batch it changes (Update mode); `version`
    * counts state revisions so a consumer (or spec) can identify the
    * newest emission per key without relying on sink ordering. State is
    * one fixed-size record per live key — the streaming shape of a
    * continuously-maintained materialized view at 100 TB/day. */
  def latestSnapshot(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    def micros(ts: java.sql.Timestamp): Long =
      math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    events
      .selectExpr("user_id", "event_type", "event_id", "ts", "value")
      .as[SnapEv]
      .groupByKey(e => (e.user_id, e.event_type))
      .mapGroupsWithState[SnapState, SnapOut](GroupStateTimeout.NoTimeout) {
        (key: (Long, String), evs: Iterator[SnapEv], state: GroupState[SnapState]) =>
          val best = evs.maxBy(e => (micros(e.ts), e.event_id))
          val bestMicros = micros(best.ts)
          val cur = state.getOption
          val keepCurrent = cur.exists(s =>
            s.tsMicros > bestMicros ||
              (s.tsMicros == bestMicros && s.event_id >= best.event_id))
          val next =
            if (keepCurrent) cur.get
            else SnapState(best.event_id, bestMicros, best.value,
              cur.map(_.version).getOrElse(0L) + 1L)
          state.update(next)
          SnapOut(key._1, key._2, next.event_id, next.tsMicros, next.value, next.version)
      }
      .toDF()
  }

  // ------------------------------------------------------ funnel conversion
  final case class FunnelEv(
      user_id: Long, event_type: String, event_id: Long, ts: java.sql.Timestamp)
  final case class FunnelState(
      lastViewUs: Long, hasView: Boolean,
      nViews: Long, nPurchases: Long, nConverted: Long, version: Long)
  final case class FunnelOut(
      user_id: Long, n_views: Long, n_purchases: Long, n_converted: Long,
      converted: Boolean, version: Long)

  /** Streaming view→purchase funnel — the streaming twin of batch q29:
    * per user, count views, purchases, and purchases within one hour of
    * the latest preceding view. State is one fixed-size record per user
    * (latest view time + three counters); each micro-batch that touches a
    * user re-emits their current funnel row (Update mode) with a `version`
    * so consumers identify the newest emission without sink ordering.
    *
    * Equivalence contract with batch q29: exact when each user's events
    * arrive in event-time order across micro-batches (the landing-file
    * shape; within a batch the iterator is sorted on (ts, event_id), the
    * batch query's exact tie rule). A view arriving AFTER a purchase it
    * precedes in event time can't retroactively convert that purchase —
    * production bounds that skew with a watermark + delayed emission;
    * here the state update itself is the operator under test.
    */
  def funnel(spark: SparkSession, events: DataFrame,
      windowUs: Long = 3600L * 1000000L): DataFrame = {
    import spark.implicits._
    def micros(ts: java.sql.Timestamp): Long =
      math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    events
      .selectExpr("user_id", "event_type", "event_id", "ts")
      .as[FunnelEv]
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelOut](GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[FunnelEv], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(
            FunnelState(Long.MinValue, hasView = false, 0L, 0L, 0L, 0L))
          evs.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val us = micros(e.ts)
            e.event_type match {
              case "view" =>
                st = st.copy(
                  lastViewUs = math.max(st.lastViewUs, us), hasView = true,
                  nViews = st.nViews + 1L)
              case "purchase" =>
                val conv = st.hasView && us - st.lastViewUs <= windowUs
                st = st.copy(
                  nPurchases = st.nPurchases + 1L,
                  nConverted = st.nConverted + (if (conv) 1L else 0L))
              case _ => () // other event types only mark the user as seen
            }
          }
          st = st.copy(version = st.version + 1L)
          state.update(st)
          FunnelOut(userId, st.nViews, st.nPurchases, st.nConverted,
            st.nConverted > 0L, st.version)
      }
      .toDF()
  }

  // ----------------------------------------------------- cohort retention
  final case class CohortEv(user_id: Long, day: java.sql.Timestamp)
  final case class CohortState(cohortDayUs: Long, seenOffsets: List[Long])
  final case class CohortAct(cohort_day: java.sql.Timestamp, week_offset: Long)

  /** Streaming cohort retention — the streaming twin of batch q30: each
    * user's first-seen day is their cohort, and the (cohort_day,
    * week_offset) retention matrix counts users active at each weekly
    * offset. The stateful stage emits a (cohort_day, week_offset) row only
    * the FIRST time a user is active in that week — so the downstream
    * streaming count of those activations IS q30's distinct-user count,
    * without a streaming `distinct` (whose state would be (cohort × week ×
    * user)-sized); state per user is their cohort day plus the offsets
    * already emitted, bounded by calendar weeks, not event volume.
    *
    * Equivalence contract with batch q30 (same as [[funnel]]'s): exact when
    * each user's events arrive in event-time order across micro-batches —
    * the landing-file shape. A user's first-ever event arriving late would
    * retroactively shift their cohort in the batch recompute; the stream
    * cannot reassign already-emitted offsets, and production bounds that
    * skew with a watermark on the landing feed.
    */
  def cohortRetention(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    def micros(ts: java.sql.Timestamp): Long =
      math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    val dayUs = 86400L * 1000000L
    val acts = events
      // date_trunc under the session's UTC zone: day boundaries are exact
      // multiples of dayUs, so the week offset is integer arithmetic —
      // byte-identical to batch q30's `datediff(day, cohort_day) div 7`.
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .as[CohortEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CohortState, CohortAct](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[CohortEv], state: GroupState[CohortState]) =>
          val days = evs.map(e => micros(e.day)).toSeq.distinct.sorted
          if (days.isEmpty) Iterator.empty
          else {
            var st = state.getOption.getOrElse(CohortState(days.head, Nil))
            val fresh = scala.collection.mutable.ArrayBuffer[CohortAct]()
            days.foreach { d =>
              val off = (d - st.cohortDayUs) / dayUs / 7L
              if (!st.seenOffsets.contains(off)) {
                st = st.copy(seenOffsets = off :: st.seenOffsets)
                fresh += CohortAct(
                  new java.sql.Timestamp(st.cohortDayUs / 1000L), off)
              }
            }
            state.update(st)
            fresh.iterator
          }
      }
    acts.groupBy(col("cohort_day"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  // ------------------------------------------------ last-touch attribution
  final case class AttribEv(
      user_id: Long, event_type: String, event_id: Long, ts: java.sql.Timestamp)
  final case class AttribState(lastClickUs: Long, lastClickId: Long, hasClick: Boolean)
  final case class AttribOut(
      event_id: Long, user_id: Long, us: Long, click_id: Long, gap_us: Long)

  /** Streaming last-touch attribution — the streaming twin of batch q32:
    * per-user state carries the latest click's (timestamp, id) under the
    * same (us, event_id) total order the batch window uses, and every
    * purchase emits ONE attribution row on arrival (Append mode — an
    * attribution is final the moment the purchase lands, the real-time
    * marketing feed). State per user is two longs — event-volume-
    * independent, the smallest state of any twin here.
    *
    * Equivalence contract with batch q32 (same as [[funnel]]'s): exact
    * when each user's events arrive in event-time order across
    * micro-batches; within a batch the fold sorts by (us, event_id), so a
    * same-instant click attributes exactly when it sorts before the
    * purchase — the batch window's `1 PRECEDING` strictness, reproduced.
    */
  def attribution(spark: SparkSession, events: DataFrame,
      lookbackUs: Long = 86400L * 1000000L): DataFrame = {
    import spark.implicits._
    def micros(ts: java.sql.Timestamp): Long =
      math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    events
      .selectExpr("user_id", "event_type", "event_id", "ts")
      .as[AttribEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttribState, AttribOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[AttribEv], state: GroupState[AttribState]) =>
          var st = state.getOption.getOrElse(AttribState(Long.MinValue, -1L, hasClick = false))
          val out = scala.collection.mutable.ArrayBuffer[AttribOut]()
          evs.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val us = micros(e.ts)
            e.event_type match {
              case "click" =>
                if (!st.hasClick || us > st.lastClickUs ||
                    (us == st.lastClickUs && e.event_id > st.lastClickId))
                  st = AttribState(us, e.event_id, hasClick = true)
              case "purchase" =>
                val ok = st.hasClick && us - st.lastClickUs <= lookbackUs
                out += AttribOut(e.event_id, userId, us,
                  if (ok) st.lastClickId else -1L,
                  if (ok) us - st.lastClickUs else -1L)
              case _ => ()
            }
          }
          state.update(st)
          out.iterator
      }
      .toDF()
  }

  // ------------------------------------------------- event transitions
  final case class TransEv(
      user_id: Long, event_type: String, event_id: Long, ts: java.sql.Timestamp)
  final case class TransState(lastType: String)
  final case class TransPair(from_type: String, to_type: String)

  /** Streaming event-transition matrix — the streaming twin of batch q33:
    * per-user state carries only the LAST event's type; every arriving
    * event with a predecessor emits one (from, to) pair (Append), and the
    * downstream keyed count is the live transition matrix product
    * analytics feeds sankey/flow dashboards from. State per user is one
    * string — event-volume-independent, bounded by the type vocabulary.
    *
    * Equivalence contract with batch q33 (same as [[funnel]]'s): exact
    * when each user's events arrive in event-time order across
    * micro-batches; within a batch the fold sorts by (us, event_id), the
    * batch lead-window's exact successor order. The batch query derives
    * per-from totals and probabilities from these counts — |types|²-sized
    * arithmetic the reader does on the final matrix, so the stream emits
    * the counts themselves.
    */
  def transitions(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    def micros(ts: java.sql.Timestamp): Long =
      math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    events
      .selectExpr("user_id", "event_type", "event_id", "ts")
      .as[TransEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, TransPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[TransEv], state: GroupState[TransState]) =>
          var last = state.getOption.map(_.lastType).orNull
          val out = scala.collection.mutable.ArrayBuffer[TransPair]()
          evs.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            if (last != null) out += TransPair(last, e.event_type)
            last = e.event_type
          }
          if (last != null) state.update(TransState(last))
          out.iterator
      }
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  // ------------------------------------------------- SCD2 history (q37 twin)
  final case class Scd2Ev(
      user_id: Long, event_type: String, event_id: Long, ts: java.sql.Timestamp)
  final case class Scd2State(state: String, validFromUs: Long, version: Long)
  final case class Scd2Closed(
      user_id: Long, state: String, valid_from_us: Long, valid_to_us: Long,
      version: Long)

  /** Streaming SCD2 maintenance — the streaming twin of batch q37: per
    * user, the current state lives in `GroupState` (one fixed-size record
    * per user: state + valid_from + version), and every state CHANGE emits
    * the interval it closes. This is CDC-style dimension maintenance at
    * ingest — the history table grows append-only from closed intervals,
    * while the open interval is always the state store's current record
    * (q25's snapshot twin serves that read), so no emitted row is ever
    * revised (Append mode, sink-agnostic).
    *
    * Equivalence contract with batch q37 (the stateful family's standard,
    * [[funnel]]'s): exact when each user's events arrive in event-time
    * order across micro-batches — within a batch the group sorts on
    * (ts, event_id), the batch query's tie rule. Closed streamed
    * intervals == batch q37's `is_current = false` rows.
    */
  def scd2History(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    def micros(ts: java.sql.Timestamp): Long =
      math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    events
      .selectExpr("user_id", "event_type", "event_id", "ts")
      .as[Scd2Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Closed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Scd2Ev], state: GroupState[Scd2State]) =>
          var cur = state.getOption.orNull
          val closed = scala.collection.mutable.ArrayBuffer[Scd2Closed]()
          evs.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val us = micros(e.ts)
            if (cur == null)
              cur = Scd2State(e.event_type, us, 1L)
            else if (cur.state != e.event_type) {
              closed += Scd2Closed(userId, cur.state, cur.validFromUs, us, cur.version)
              cur = Scd2State(e.event_type, us, cur.version + 1L)
            }
          }
          if (cur != null) state.update(cur)
          closed.iterator
      }
      .toDF()
  }

  // ----------------------------------------------------- stateful sessions
  final case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(sessionId: Long, lastTsMicros: Long, n: Long, value: Double)
  final case class SessionOut(user_id: Long, session_id: Long, n_events: Long, session_value: Double)

  /** Streaming sessionization: 30-minute inactivity gap starts a new
    * session. Emits closed sessions (Append mode with state timeout).
    */
  def sessionize(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val gapMicros = 1800L * 1000000L
    events
      .selectExpr("user_id", "ts", "value")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          // Full microsecond precision (getTime is millis-truncated;
          // getNanos carries the sub-second part) so the 30-min gap compare
          // matches batch q12's unix_micros exactly on sub-ms timestamps.
          def micros(ts: java.sql.Timestamp): Long =
            math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
          val sorted = evs.toSeq.sortBy(e => (micros(e.ts), e.value))
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L, 0.0))
          val closed = scala.collection.mutable.ArrayBuffer[SessionOut]()
          sorted.foreach { e =>
            val tsMicros = micros(e.ts)
            if (st.n > 0L && tsMicros - st.lastTsMicros > gapMicros) {
              closed += SessionOut(userId, st.sessionId, st.n, st.value)
              st = SessionState(st.sessionId + 1, tsMicros, 1L, e.value)
            } else {
              st = SessionState(st.sessionId, tsMicros, st.n + 1, st.value + e.value)
            }
          }
          state.update(st)
          closed.iterator
      }
      .toDF()
  }
}

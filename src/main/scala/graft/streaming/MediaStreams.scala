package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.operators.Multimodal

/** Streaming twin of the multimodal ingest surface: media records
  * (opaque binary payloads + typed metadata) as an arriving stream, with
  * the at-ingest steps a media pipeline runs before anything heavier
  * (plus [[shardAssigned]]'s packing cursor and [[entropyGate]]'s
  * pre-decode corruption screen):
  *
  *  1. **Stateless stamping** ([[signed]]) — byte length, payload digest,
  *     stub-decode dimensions (m01's projection) and the 64-bit
  *     perceptual signature (m06's `blockhash64`), all per-row work over
  *     one record's own bytes: Append-mode safe, no shuffle, no state.
  *  2. **Near-dup gate** ([[nearDupGate]]) — the arriving signature is
  *     banded into 4×16-bit chunks (m06's rule) and probed against a
  *     BROADCAST static chunk index of the existing corpus; candidate
  *     collisions verify by exact Hamming distance in the same
  *     projection. Per-pair verification is exact and stateless, so —
  *     unlike the MinHash candidate probe in [[DocStreams]], which defers
  *     Jaccard verification — the gate's emitted pairs ARE final
  *     verdicts; cross-chunk duplicate collisions are folded within the
  *     watermark horizon (state O(rate × horizon), the bound that keeps
  *     continuous ingest feasible).
  *
  * Equivalence contract (spec-asserted): streamed (existing, arriving)
  * verdicts == the batch m06 pair set restricted to corpus×arrival
  * pairs — same signature, same bands, same Hamming threshold.
  */
object MediaStreams {

  /** Media records as a file stream over a staging directory (the staged
    * parquet-ingest shape [[VectorStreams.readVectorStream]] uses);
    * `maxFilesPerTrigger=1` → one staged file per micro-batch. */
  def readMediaStream(spark: SparkSession, dir: String, schemaFrom: DataFrame): DataFrame =
    spark.readStream
      .schema(schemaFrom.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** At-ingest stamping: arrival time, m01's metadata projection and
    * m06's perceptual signature. The signature is the batch
    * [[Multimodal.blockhash64]] kernel per row (value-identical by
    * construction); md5/octet_length are the same codegen'd column
    * functions the batch query uses.
    *
    * Empty payloads are dropped — the SAME rule the batch signature
    * kernel applies ([[Multimodal.mediaSignatures]] filters
    * `payload.nonEmpty`, and the m06 oracle's `length(text) > 0` mirrors
    * it), so an empty arrival is absent from BOTH the streamed stamp and
    * the batch m06 pair set and the equivalence contract holds even when
    * the fixture contains empty records (spec-pinned with a planted empty
    * arrival). */
  def signed(stream: DataFrame): DataFrame = {
    val phUdf = udf((payload: Array[Byte]) => Multimodal.blockhash64(payload))
    stream
      .filter(octet_length(col("payload")) > 0)
      .withColumn("arrival_ts", current_timestamp())
      .select(
        col("doc_id"), col("media_type"), col("arrival_ts"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("payload_md5"),
        phUdf(col("payload")).as("ph"))
  }

  /** The corpus side of the gate: (doc_id, ph, chunk, ck) band index of
    * an existing signature table — built batch-side once (or maintained
    * by appending each committed micro-batch), broadcast into the probe. */
  def chunkIndex(sigs: DataFrame): DataFrame = {
    val chunkArr = array((0 until 4).map(c =>
      shiftrightunsigned(col("ph"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)
    sigs.select(col("doc_id"), col("ph"), posexplode(chunkArr).as(Seq("chunk", "ck")))
  }

  /** Probe + verify: arriving signatures against the broadcast corpus
    * chunk index; chunk collision generates the candidate, exact Hamming
    * distance decides it — final verdicts, not candidates. */
  def nearDupGate(signedStream: DataFrame, corpusIndex: DataFrame,
      maxDist: Int, horizon: String = "1 hour"): DataFrame = {
    // Chunk the stream inline (carrying arrival_ts) — a chunkIndex+join
    // formulation would be a stream-stream self-join, which Structured
    // Streaming rejects without time bounds; the explode is stateless.
    val chunkArr = array((0 until 4).map(c =>
      shiftrightunsigned(col("ph"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)
    val streamChunks = signedStream.select(
      col("doc_id"), col("ph"), col("arrival_ts"),
      posexplode(chunkArr).as(Seq("chunk", "ck")))
    streamChunks
      .join(broadcast(corpusIndex
          .select(col("doc_id").as("existing_id"), col("ph").as("corpus_ph"),
            col("chunk"), col("ck"))),
        Seq("chunk", "ck"))
      .filter(col("doc_id") =!= col("existing_id"))
      .select(
        col("doc_id").as("arriving_id"), col("existing_id"),
        bit_count(col("ph").bitwiseXOR(col("corpus_ph"))).cast("long").as("hamming"),
        col("arrival_ts"))
      .filter(col("hamming") <= maxDist)
      .withWatermark("arrival_ts", horizon)
      .dropDuplicatesWithinWatermark("arriving_id", "existing_id")
      .select("arriving_id", "existing_id", "hamming")
  }

  /** Streaming twin of m13's pre-decode entropy gate: score every
    * ARRIVING payload's symbol entropy and flag it against a FROZEN
    * review-queue cutoff ([[Multimodal.payloadEntropyCutoff]] over the
    * resident corpus — the corpus defines "flat"; an arrival doesn't
    * move the bar mid-stream). This is the cheapest corruption detector
    * an ingest path can run: it rejects blank frames / silence / zero
    * fill BEFORE codec time is spent, so it must be stateless — and it
    * is: per-row higher-order-function arithmetic over the record's own
    * symbols, no explode-shuffle, no watermark, no state store (the
    * [[VectorStreams.cartographyGate]] pattern).
    *
    * Value-identity with batch m13 (spec-asserted): the per-symbol term
    * is the SAME quantization — floor(c·ln c·1e6 + 0.5) as BIGINT — so
    * the per-doc sum is exact under any evaluation order, whether the
    * counts come from batch's (doc, symbol) aggregate or from this
    * row's `transform(array_distinct(syms), …)` loop; H = ln n − Σ/(n·1e6)
    * is then the identical deterministic double expression. Per-record
    * cost is ≤ 37 filter passes over the symbol array (the [a-z0-9 ]
    * alphabet bounds the distinct set) — the gate trades that bounded
    * per-row factor for zero shuffle, the right side of the trade at
    * ingest; corpus-scale recompute stays on batch m13's explode+agg
    * shape. Empty/no-symbol payloads score entropy 0, same as batch's
    * left-join coalesce. */
  def entropyGate(stream: DataFrame, cutoffMicro: Long): DataFrame = {
    // syms materialized in its own projection: lambda bodies get no
    // common-subexpression elimination, so inlining it would re-split
    // the payload once per distinct symbol.
    val syms = stream.select(
      col("doc_id"), col("media_type"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      expr("filter(split(lower(cast(payload as string)), ''), " +
        "c -> c rlike '^[a-z0-9 ]$')").as("syms"))
    val scored = syms
      .withColumn("n", size(col("syms")).cast("long"))
      .withColumn("n_symbols", size(array_distinct(col("syms"))).cast("long"))
      .withColumn("term_micro", expr(
        """aggregate(
             transform(array_distinct(syms), s -> size(filter(syms, x -> x = s))),
             cast(0 as bigint),
             (acc, c) -> acc + cast(floor(cast(c as double) * ln(cast(c as double))
               * 1e6 + 0.5) as bigint))"""))
      .withColumn("entropy_micro",
        when(col("n") > 0,
          floor((log(col("n").cast("double"))
            - col("term_micro").cast("double") / (col("n").cast("double") * 1e6))
            * 1e6 + 0.5).cast("long"))
          .otherwise(lit(0L)))
    scored.select(col("doc_id"), col("media_type"), col("n_bytes"),
      col("n_symbols"),
      round(col("entropy_micro").cast("double") / 1e6, 6).as("entropy"),
      (col("entropy_micro") <= lit(cutoffMicro)).as("flat_payload"))
  }

  /** One arriving payload's size, keyed by its writer stream. */
  final case class ShardEv(doc_id: Long, media_type: String, n_bytes: Long)

  /** Per-writer packing state: the running byte cursor — ONE long per
    * writer key, the entire state of the assigner. */
  final case class ShardCursor(cumBytes: Long)

  /** One record's assigned slot in the shard stream (m09's row shape plus
    * the writer key). */
  final case class ShardSlot(doc_id: Long, media_type: String, n_bytes: Long,
      shard_first: Long, shard_last: Long, offset_in_shard: Long, n_shards: Long)

  /** At-ingest shard assignment — the streaming twin of m09's batch
    * manifest: arriving payloads are packed into fixed-byte-budget shards
    * AS THEY ARRIVE, so the (shard, offset, length) record a multimodal
    * loader seeks by exists the moment the record lands, instead of after
    * an end-of-day batch repack. Shard packing is inherently sequential,
    * so the cursor is keyed the way production ingest actually writes:
    * one independent shard stream per WRITER (here `media_type`; a
    * deployment keys by source/ingest-partition) — state is one byte
    * cursor per writer, O(#writers), never O(records). Empty payloads are
    * dropped by the same rule as the batch kernel (m09 filters
    * `n_bytes > 0`).
    *
    * Equivalence contract (spec-asserted across micro-batch boundaries,
    * on a MULTI-writer fixture): batch m09 packs per the SAME writer key
    * (`Multimodal.shardManifest` runs its prefix scan per media_type), so
    * for a writer whose records arrive in doc_id order — the landing-file
    * shape, same contract as [[EventStreams.funnel]]'s — the streamed
    * slots are row-identical to batch m09 restricted to that writer, with
    * any number of writers.
    * Within one micro-batch the group's records are sorted by doc_id
    * before packing, so intra-batch file order can't reorder the stream.
    */
  def shardAssigned(stream: DataFrame, shardBytes: Long = 4096L): Dataset[ShardSlot] = {
    import stream.sparkSession.implicits._
    stream
      .filter(octet_length(col("payload")) > 0)
      .select(col("doc_id"), col("media_type"),
        octet_length(col("payload")).cast("long").as("n_bytes"))
      .as[ShardEv]
      .groupByKey(_.media_type)
      .flatMapGroupsWithState[ShardCursor, ShardSlot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (mt: String, evs: Iterator[ShardEv], state: org.apache.spark.sql.streaming.GroupState[ShardCursor]) =>
          var cum = state.getOption.map(_.cumBytes).getOrElse(0L)
          val slots = evs.toSeq.sortBy(_.doc_id).map { e =>
            val first = cum / shardBytes
            val last = (cum + e.n_bytes - 1) / shardBytes
            val slot = ShardSlot(e.doc_id, mt, e.n_bytes,
              first, last, cum % shardBytes, last - first + 1)
            cum += e.n_bytes
            slot
          }
          state.update(ShardCursor(cum))
          slots.iterator
      }
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.Multimodal
import graft.streaming.{EventStreams, MediaStreams}

/** Streaming media-ingest surface: the at-ingest stamp must be
  * value-identical to the batch m01 metadata + m06 signature kernels, and
  * the near-dup gate (chunk probe + exact Hamming verify against a
  * broadcast corpus index) must emit exactly the batch m06 pair set
  * restricted to corpus×arrival pairs.
  */
class MediaStreamsSpec extends SparkSpec {

  private val maxDist = 14 // m06's shipped threshold

  /** Stage the media table as two parquet files → two micro-batches,
    * split into an "existing corpus" and an "arrivals" half by doc_id. */
  private def staged(): (String, Long) = {
    val base = Files.createTempDirectory("graft-media-stream").toString
    val media = Multimodal.mediaTable(spark, sf).toDF()
    val maxId = media.agg(max("doc_id")).head().getLong(0)
    val split = maxId / 2
    // Plant one empty-payload arrival: the contract (empties dropped at
    // the stamp, matching the batch kernels' nonEmpty rule) must hold
    // when an empty record actually arrives, not only on fixtures that
    // happen to contain none.
    import spark.implicits._
    val empty = Seq((maxId + 1, "image/stub", Array.emptyByteArray))
      .toDF("doc_id", "media_type", "payload")
    media.filter(col("doc_id") >= split).unionByName(empty).repartition(2)
      .write.mode("overwrite").parquet(s"$base/arrivals")
    (base, split)
  }

  test("at-ingest stamp == batch m01 metadata + m06 signature per row") {
    val (base, split) = staged()
    val media = Multimodal.mediaTable(spark, sf).toDF()
    val stamped = MediaStreams.signed(
      MediaStreams.readMediaStream(spark, s"$base/arrivals", media))
      .select("doc_id", "n_bytes", "payload_md5", "ph")
    val q = EventStreams.runToMemory(stamped, "media_stamp_out", OutputMode.Append)
    try {
      q.processAllAvailable()
      val streamed = spark.table("media_stamp_out").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getString(2), r.getLong(3)))).toMap
      val batchMeta = media.filter(col("doc_id") >= split)
        .filter(octet_length(col("payload")) > 0)
        .select(col("doc_id"), octet_length(col("payload")).cast("long"),
          md5(col("payload")))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getString(2)))).toMap
      val batchSig = Multimodal.mediaSignatures(
          Multimodal.mediaTable(spark, sf).filter(_.doc_id >= split))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(streamed.keySet == batchMeta.keySet, "row set drift vs batch metadata")
      streamed.foreach { case (id, (nb, md, ph)) =>
        assert((nb, md) == batchMeta(id), s"metadata drift for doc $id")
        assert(ph == batchSig(id), s"signature drift for doc $id")
      }
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming near-dup gate == batch m06 pairs restricted to corpus x arrivals") {
    val (base, split) = staged()
    val media = Multimodal.mediaTable(spark, sf).toDF()
    val corpusIndex = MediaStreams.chunkIndex(
      Multimodal.mediaSignatures(
        Multimodal.mediaTable(spark, sf).filter(_.doc_id < split)))
    val gate = MediaStreams.nearDupGate(
      MediaStreams.signed(
        MediaStreams.readMediaStream(spark, s"$base/arrivals", media)),
      corpusIndex, maxDist)
    val q = EventStreams.runToMemory(gate, "media_gate_out", OutputMode.Append)
    try {
      q.processAllAvailable()
      val streamed = spark.table("media_gate_out").collect()
        .map(r => (r.getLong(1), r.getLong(0), r.getLong(2))).toSet // (existing, arriving, d)
      val batch = Multimodal.mediaNeardupPairs(Multimodal.mediaTable(spark, sf), maxDist)
        .filter(col("a") < split && col("b") >= split)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch,
        s"gate drift: missing=${batch.diff(streamed).take(5)} extra=${streamed.diff(batch).take(5)}")
      assert(batch.nonEmpty, "fixture degenerate: no cross near-dup pairs at sf0.001")
    } finally q.stop()
  }

  test("streaming entropy gate == batch m13 scores under a frozen cutoff; day-one cutoff is -1") {
    val (base, split) = staged()
    val media = Multimodal.mediaTable(spark, sf)
    val maxId = media.toDF().agg(max("doc_id")).head().getLong(0)
    // Batch scores for the arrivals half (the cutoff-independent truth).
    val batchScores = Multimodal.entropyBase(media)
      .filter(col("doc_id") >= split)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap // media_type, n_bytes, n_symbols, entropy_micro
    // Freeze a cutoff strictly between the arrivals' min and max entropy
    // so BOTH flag values must appear — a max-anchored cutoff can go
    // vacuous on a ≤50-doc fixture where the 50-flattest queue covers
    // the whole corpus.
    val micros = batchScores.values.map(_._4)
    assert(micros.min < micros.max, "fixture degenerate: zero entropy spread")
    val cutoff = (micros.min + micros.max) / 2
    val gate = MediaStreams.entropyGate(
      MediaStreams.readMediaStream(spark, s"$base/arrivals", media.toDF()), cutoff)
    val q = EventStreams.runToMemory(gate, "media_entropy_out", OutputMode.Append)
    try {
      q.processAllAvailable()
      val streamed = spark.table("media_entropy_out").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getBoolean(5))).toMap
      // The planted empty arrival is absent from the batch table: the
      // gate must score it 0 symbols / 0.0 entropy (batch's left-join
      // coalesce rule) and flag it flat (0 <= any corpus cutoff).
      assert(streamed(maxId + 1) == (("image/stub", 0L, 0L, 0.0, true)),
        s"planted empty arrival scored ${streamed(maxId + 1)}")
      val real = streamed - (maxId + 1)
      assert(real.keySet == batchScores.keySet, "row set drift vs batch m13")
      real.foreach { case (id, (mt, nb, ns, ent, flat)) =>
        val (bmt, bnb, bns, bmicro) = batchScores(id)
        assert((mt, nb, ns) == ((bmt, bnb, bns)), s"metadata drift for doc $id")
        assert(ent == math.round(bmicro.toDouble / 1e6 * 1e6) / 1e6,
          s"entropy drift for doc $id: $ent vs micro $bmicro")
        assert(flat == (bmicro <= cutoff), s"flag drift for doc $id")
      }
      assert(real.values.exists(_._5) && real.values.exists(!_._5),
        "cutoff failed to split the arrivals")
      // The production cutoff must equal an independent recompute of the
      // 50-flattest bound: sort the corpus scores by (entropy, doc_id),
      // take 50, read the max.
      val full = Multimodal.entropyBase(media)
        .select("entropy_micro", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.take(50).map(_._1).max
      assert(Multimodal.payloadEntropyCutoff(media) == full)
      // Day-one stance: empty resident corpus -> -1 -> nothing flagged.
      assert(Multimodal.payloadEntropyCutoff(media.filter(_.doc_id < 0)) == -1L)
    } finally q.stop()
  }

  test("at-ingest shard assignment == batch m09 manifest, multi-writer, cursor survives batch boundary") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-media-shard").toString
    // TWO writers (doc_id parity picks the media_type): each must get an
    // INDEPENDENT byte cursor in both engines — the single-type fixture
    // could not distinguish per-writer packing from one global cursor.
    val media = Multimodal.mediaTable(spark, sf).toDF()
      .withColumn("media_type",
        when(col("doc_id") % 2 === 0, lit("image/stub")).otherwise(lit("audio/stub")))
    val maxId = media.agg(max("doc_id")).head().getLong(0)
    val split = maxId / 2
    // Wave 1 staged before the query starts; wave 2 lands mid-stream, so
    // each writer's packing cursor must carry across the micro-batch
    // boundary.
    media.filter(col("doc_id") < split).coalesce(1)
      .write.mode("overwrite").parquet(s"$base/arrivals")
    val assigned = MediaStreams.shardAssigned(
      MediaStreams.readMediaStream(spark, s"$base/arrivals", media)).toDF()
    val q = EventStreams.runToMemory(assigned, "media_shard_out",
      OutputMode.Append)
    try {
      q.processAllAvailable()
      media.filter(col("doc_id") >= split).coalesce(1)
        .write.mode("append").parquet(s"$base/arrivals")
      q.processAllAvailable()
      def slots(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("media_type")) ->
          (r.getAs[Long]("n_bytes"), r.getAs[Long]("shard_first"),
            r.getAs[Long]("shard_last"), r.getAs[Long]("offset_in_shard"),
            r.getAs[Long]("n_shards"))).toMap
      val streamed = slots(spark.table("media_shard_out").collect())
      val batch = slots(Multimodal.shardManifest(
        media.as[Multimodal.MediaRecord]).collect())
      assert(streamed.keySet == batch.keySet, "manifest row set drift")
      streamed.foreach { case (id, slot) =>
        assert(slot == batch(id), s"slot drift for doc $id: $slot vs ${batch(id)}")
      }
      assert(streamed.count(_._1._2 == "image/stub") > 0 &&
        streamed.count(_._1._2 == "audio/stub") > 0,
        "fixture degenerate: a writer produced no records")
      // The boundary actually exercised state, PER WRITER: each writer's
      // first wave-2 record must sit at that writer's wave-1 closing
      // cursor, not at offset 0 and not at the other writer's cursor.
      Seq("image/stub", "audio/stub").foreach { mt =>
        val wave1Bytes = media
          .filter(col("doc_id") < split && col("media_type") === mt)
          .agg(sum(octet_length(col("payload")))).head().getLong(0)
        val firstWave2 = streamed.filter(s => s._1._1 >= split && s._1._2 == mt)
          .minBy(_._1._1)
        assert(firstWave2._2._4 == wave1Bytes % 4096L,
          s"$mt wave-2 offset must continue that writer's wave-1 cursor")
      }
    } finally q.stop()
  }
}

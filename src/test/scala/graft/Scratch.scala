package graft

/** Throwaway profiling main (dev only, test scope — run via
  * `sbt "Test/runMain graft.Scratch <names...>"`): time named inventory
  * queries twice each (warm second run) without the full bench. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("d02_dedup_minhash_lsh", "d03_dedup_simhash", "d04_ngram_jaccard", "d06_dedup_clusters")
    val spark = GraftSession.get("graft-scratch")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val jobStartNs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val desc = Option(j.properties.getProperty("spark.job.description"))
          .orElse(j.stageInfos.lastOption.map(_.name)).getOrElse("?")
        jobStartNs.put(j.jobId, (System.nanoTime(), desc.take(90)))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(jobStartNs.remove(j.jobId)).foreach { case (t0, desc) =>
          jobLog.add(f"job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $desc")
        }
    })
    def dumpJobs(): Unit = {
      if (sys.env.contains("SCRATCH_JOBS")) jobLog.forEach(l => println(s"[jobs] $l"))
      jobLog.clear()
    }
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    if (names == Seq("d10prof")) { d10prof(spark, d); spark.stop(); return }
    if (names == Seq("d02lazy")) { d02lazy(spark, d); spark.stop(); return }
    if (names == Seq("s18prof")) { s18prof(spark, d); spark.stop(); return }
    if (names == Seq("m13prof")) { m13prof(spark, d); spark.stop(); return }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to 2).foreach { i =>
        spark.catalog.clearCache()
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        println(f"[scratch] $n run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s " +
          s"(${jobs.get() - j0} jobs)")
        dumpJobs()
      }
    }
    spark.stop()
  }

  /** Stepwise m13/m14 leg timings at the given SF dir (throwaway — run
    * with SPARK_GRAFT_SF_DIR=target/scale100x for the 100× attribution):
    * which leg carries the doc wave's highest ratio — the entropy
    * byte-scan (char explode, rows ∝ payload bytes), the m06 banded
    * signature near-dup, or the m09 two-phase pack? Each leg is
    * materialized through the noop sink (the s17 lesson: `count()` lets
    * the optimizer delete the subtree under test). */
  private def m13prof(spark: org.apache.spark.sql.SparkSession, d: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.Multimodal
    def time[A](label: String)(f: => A): A = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = f
      println(f"[m13] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val media = Multimodal.mediaTable(spark, d)
    (1 to 2).foreach { round =>
      println(s"[m13] -- pass $round --")
      time("explode+perSym agg (byte scan)") {
        noop(media.toDF()
          .select(col("doc_id"), explode(expr(
            "filter(split(lower(cast(payload as string)), ''), c -> c rlike '^[a-z0-9 ]$')"))
            .as("sym"))
          .groupBy("doc_id", "sym").agg(count(lit(1)).as("c")))
      }
      time("entropyBase (full doc grain)") { noop(Multimodal.entropyBase(media)) }
      time("m13 full (base + cutoff attach)") {
        noop(SparkEntry.queries("m13_payload_entropy")(spark, d))
      }
      time("m06 leg: banded neardup pairs") {
        noop(Multimodal.mediaNeardupPairs(media, 14))
      }
      time("m09 leg: shardManifest (all media)") {
        noop(Multimodal.shardManifest(media))
      }
      time("m14 full (composed)") {
        noop(SparkEntry.queries("m14_media_pipeline")(spark, d))
      }
    }
  }

  /** Stepwise s18 stage timings at the given SF dir (throwaway): where do
    * the seconds go — the Lloyd loop, the one-field assignment (the loop's
    * shape), or the two-field (c + cos_micro) assignment aggregate? */
  private def s18prof(spark: org.apache.spark.sql.SparkSession, d: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val e = graft.sources.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[s18] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val q = time("quant+checkpoint") {
      e.select(col("vec_id"), Similarity.quantMilli.as("qe")).localCheckpoint()
    }
    val cents = time("lloyd loop (3 iters)") {
      Similarity.kmeansCentroidsFromQuant(q, 8, 3)
    }
    time("assign c only (count)") {
      q.withColumn("c", Similarity.centroidBest(cents, col("qe")).getField("c"))
        .groupBy("c").agg(count(lit(1))).collect()
    }
    val asg2 = q.withColumn("b", Similarity.centroidBest(cents, col("qe")))
      .select(col("b.c").as("cluster_id"),
        floor(-col("b.nc") * 1e6 + 0.5).cast("long").as("cos_micro"))
    time("assign c+cos (agg)") {
      asg2.groupBy("cluster_id").agg(count(lit(1)), sum("cos_micro")).collect()
    }
    val wsc = asg2.queryExecution.executedPlan.toString
    println(s"[s18] c+cos plan: wholeStageCodegen=" +
      wsc.linesIterator.count(_.contains("WholeStageCodegen")) +
      " codegenFallbackMarkers=" + wsc.linesIterator.count(_.contains("*(")) )
    // Exact s18 construction: wave column in the checkpoint, loop trained
    // on the resident FILTER of it, 4-sum byC aggregate.
    val mx = e.agg(max("vec_id")).head().getLong(0)
    val split = mx * 4 / 5
    val q2 = time("q with wave (ckpt)") {
      e.select(col("vec_id"),
          when(col("vec_id") >= split, lit("delta")).otherwise(lit("resident"))
            .as("wave"),
          Similarity.quantMilli.as("qe"))
        .localCheckpoint()
    }
    val cents2 = time("lloyd on resident filter") {
      Similarity.kmeansCentroidsFromQuant(
        q2.filter(col("wave") === "resident").select(col("vec_id"), col("qe")), 8, 3)
    }
    time("byC 4-sum agg") {
      q2.withColumn("b", Similarity.centroidBest(cents2, col("qe")))
        .select(col("wave"), col("b.c").as("cluster_id"),
          floor(-col("b.nc") * 1e6 + 0.5).cast("long").as("cos_micro"))
        .groupBy("cluster_id").agg(
          sum(when(col("wave") === "resident", 1L).otherwise(0L)),
          sum(when(col("wave") === "delta", 1L).otherwise(0L)),
          sum(when(col("wave") === "resident", col("cos_micro")).otherwise(0L)),
          sum(when(col("wave") === "delta", col("cos_micro")).otherwise(0L)))
        .collect()
    }
    // The function's own tail: centsDF left-join byC, checkpointed.
    locally {
      import spark.implicits._
      val byC = q2.withColumn("b", Similarity.centroidBest(cents2, col("qe")))
        .select(col("wave"), col("b.c").as("cluster_id"),
          floor(-col("b.nc") * 1e6 + 0.5).cast("long").as("cos_micro"))
        .groupBy("cluster_id").agg(
          sum(when(col("wave") === "resident", 1L).otherwise(0L)).as("n_res"),
          sum(when(col("wave") === "delta", 1L).otherwise(0L)).as("n_delta"),
          sum(when(col("wave") === "resident", col("cos_micro")).otherwise(0L)).as("res_cs"),
          sum(when(col("wave") === "delta", col("cos_micro")).otherwise(0L)).as("delta_cs"))
      time("base join + checkpoint") {
        val b = cents2.map(_._1).toDF("cluster_id")
          .join(byC, Seq("cluster_id"), "left")
          .select(col("cluster_id"),
            coalesce(col("n_res"), lit(0L)).as("n_res"),
            coalesce(col("n_delta"), lit(0L)).as("n_delta"),
            coalesce(col("res_cs"), lit(0L)).as("res_cs"),
            coalesce(col("delta_cs"), lit(0L)).as("delta_cs"))
          .localCheckpoint()
        println("[s18] base plan BEFORE checkpoint:")
        cents2.map(_._1).toDF("cluster_id")
          .join(byC, Seq("cluster_id"), "left").explain("formatted")
        b.count()
      }
    }
    time("FULL clusterPopulationDrift") {
      Similarity.clusterPopulationDrift(e).collect()
    }
  }

  /** A/B: d02 with the banded table eagerly checkpointed (current) vs left
    * lazy, relying on AQE exchange reuse to share the signature agg between
    * the self-join's two sides (throwaway). */
  private def d02lazy(spark: org.apache.spark.sql.SparkSession, d: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    def run(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 3).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        println(f"[ab] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    def lazyPairs(): org.apache.spark.sql.DataFrame = {
      val hs = Dedup.materializedShingleHashes(graft.sources.Tables.documents(spark, d))
      val cands = Dedup.lshCandidatesFromBanded(
        Dedup.bandBuckets(Dedup.signaturesFromHashes(hs)))
      Dedup.jaccardPairsHashed(hs, Some(cands))
        .filter(col("jaccard") >= 0.5)
        .orderBy("a", "b")
    }
    run("ckpt ")(SparkEntry.queries("d02_dedup_minhash_lsh")(spark, d))
    run("lazy ")(lazyPairs())
    def reuseReport(label: String): Unit = {
      val lp = lazyPairs()
      lp.collect()
      val ex = lp.queryExecution.executedPlan.toString
      println(s"[ab] $label final plan: reusedExchange=" +
        ex.linesIterator.count(_.contains("ReusedExchange")) +
        " reusedStage=" + ex.linesIterator.count(_.contains("ReusedQueryStage")) +
        " minhashAggs=" + ex.linesIterator.count(_.contains("minhash_sig")) +
        " final=" + ex.linesIterator.next().contains("isFinalPlan=true"))
    }
    reuseReport("lazy-bhj")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    reuseReport("lazy-smj")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
  }

  /** Stepwise d10 stage timings (throwaway; mirrors incrementalKeepList's
    * materialization order using the public pieces). */
  private def d10prof(spark: org.apache.spark.sql.SparkSession, d: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = graft.sources.Tables.documents(spark, d)
    val split = t("max(doc_id)")(docs.agg(max("doc_id")).head().getLong(0) * 4 / 5)
    val corpus = docs.filter(col("doc_id") < split)
    val delta = docs.filter(col("doc_id") >= split)
    val cHs = t("cHs corpus shingles ckpt")(Dedup.materializedShingleHashes(corpus))
    val cBands = Dedup.bandBuckets(Dedup.signaturesFromHashes(cHs))
    t("cBands corpus sigs+bands")(cBands.write.format("noop").mode("overwrite").save())
    val dHs = t("dHs delta shingles ckpt")(Dedup.materializedShingleHashes(delta))
    val dBanded = t("dBanded ckpt")(
      Dedup.bandBuckets(Dedup.signaturesFromHashes(dHs)).localCheckpoint())
    t("delta fp scan")(delta.select(md5(col("text"))).write.format("noop").mode("overwrite").save())
    t("corpus fp scan")(corpus.select(md5(col("text"))).write.format("noop").mode("overwrite").save())
    t("full d10")(SparkEntry.queries("d10_incremental_keep")(spark, d)
      .write.format("noop").mode("overwrite").save())
    t("full d10 again")(SparkEntry.queries("d10_incremental_keep")(spark, d)
      .write.format("noop").mode("overwrite").save())
  }
}

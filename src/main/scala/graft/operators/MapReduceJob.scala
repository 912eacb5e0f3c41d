package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.functions.{Md5Mod, Md5Partitioner}

/** Hadoop-streaming-style MapReduce facade — the reference's user contract
  * (reference `mapreduce/submit.py:80-88` job descriptor; map → md5-hash
  * partition → sort within partition → k-way merge → streaming group reduce
  * → `part-NNNNN` text output, per SURVEY.md §2 ops 3–11) re-expressed on
  * Spark.
  *
  * Native mappers/reducers run as Scala functions inside the JVM; external
  * stdin→stdout executables are supported through [[pipeMap]] (`RDD.pipe`,
  * the literal Hadoop-streaming equivalent). The md5 routing + whole-line
  * sort reproduce the reference's observable output contract: each output
  * partition r holds exactly the keys with `md5(key) % R == r`, key-sorted
  * (reference `tests/test_worker_08.py:246-257`).
  *
  * This facade is intentionally the only RDD-based operator in the engine:
  * its contract *is* imperative per-partition layout. Everything else stays
  * in DataFrame land for Catalyst.
  */
object MapReduceJob {

  /** Job descriptor, mirroring the reference's JSON job
    * (input/output/mapper/reducer/parallelism — reference
    * `submit.py:80-88` carries BOTH `num_mappers` and `num_reducers`).
    * `numMappers = 0` (default) lets Spark pick map parallelism from the
    * input splits; > 0 reproduces the reference's exact round-robin
    * file→task assignment (see [[mapInput]]). */
  final case class JobSpec(
      inputDir: String,
      mapper: String => IterableOnce[(String, String)],
      reducer: (String, Iterator[String]) => IterableOnce[String],
      numReducers: Int,
      numMappers: Int = 0)

  /** Input scan honoring `numMappers` (SURVEY §2 ops 1–2): list regular
    * files, sorted by name (reference `manager/__main__.py:320-327`), and
    * assign file i to map task `i % numMappers` (reference
    * `manager/__main__.py:330-334`) — exactly the reference's split
    * layout, one RDD partition per map task. Files are read executor-side
    * through the Hadoop FileSystem API, so the same code path works on
    * local disk and on a distributed store. With `numMappers <= 0` the
    * scan is Spark's own split packing (better at scale: splits sized by
    * bytes, not file count).
    */
  def mapInput(spark: SparkSession, inputDir: String, numMappers: Int): RDD[String] =
    if (numMappers <= 0) spark.read.textFile(inputDir).rdd
    else {
      val dir = new Path(inputDir)
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val sortedFiles = fs.listStatus(dir).filter(_.isFile)
        .map(_.getPath.toString).sorted.toSeq
      val tasks = (0 until numMappers)
        .map(t => sortedFiles.zipWithIndex.collect { case (f, i) if i % numMappers == t => f })
      // Ship the SESSION's Hadoop configuration to executors (a fresh
      // `new Configuration()` in the closure would silently drop
      // configured credentials / filesystem bindings — S3A keys, custom
      // schemes, kerberos — on a real cluster).
      val hadoopConfB = spark.sparkContext.broadcast(
        new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
      spark.sparkContext.parallelize(tasks, numMappers).flatMap { files =>
        files.iterator.flatMap { f =>
          val p = new Path(f)
          // Executor-side open via the path's own FileSystem, scheme from
          // the URI, resolved against the broadcast session config.
          val in = p.getFileSystem(hadoopConfB.value.value).open(p)
          val reader = new java.io.BufferedReader(
            new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
          new Iterator[String] {
            private var line = reader.readLine()
            if (line == null) reader.close()
            def hasNext: Boolean = line != null
            def next(): String = {
              val l = line
              line = reader.readLine()
              if (line == null) reader.close()
              l
            }
          }
        }
      }
    }

  /** Word-count mapper/reducer (reference `tests/testdata/exec/wc_map.sh:12`,
    * `wc_reduce.sh:14`): split on space/tab AND literal brackets — the
    * reference's `tr '[ \t]' '\n'` treats SET1 as the four literal chars
    * `[`, space, tab, `]`, so brackets are token separators too. Empty
    * tokens are kept (blank lines count under the empty key). */
  val wcMapper: String => IterableOnce[(String, String)] =
    line => line.toLowerCase.split("[ \t\\[\\]]", -1).map(w => (w, "1"))
  val wcReducer: (String, Iterator[String]) => IterableOnce[String] =
    (key, vals) => Iterator.single(s"$key\t${vals.map(_.toInt).sum}")

  /** Grep mapper/reducer (reference `tests/testdata/exec/grep_map.py:14-28`,
    * `grep_reduce.py:14-27`): emit matching lines under constant key "1".
    * Only the LINE is lowercased for the match — the reference does
    * `query in line.lower()` without lowering the query, so an uppercase
    * query matches nothing (reproduced here for parity). */
  def grepMapper(query: String): String => IterableOnce[(String, String)] =
    line => {
      val t = line.strip()
      if (t.nonEmpty && t.toLowerCase.contains(query)) Iterator.single(("1", t))
      else Iterator.empty
    }
  val grepReducer: (String, Iterator[String]) => IterableOnce[String] =
    (_, vals) => vals

  /** Run a job: returns one `Dataset[String]` whose partition p contains the
    * reducer output for md5-routed partition p, key-sorted — the in-memory
    * form of the reference's `part-{p:05d}` files. */
  def run(spark: SparkSession, spec: JobSpec): Dataset[String] = {
    import spark.implicits._
    val mapped = mapInput(spark, spec.inputDir, spec.numMappers).flatMap(spec.mapper)
    // Key by (key, value) so repartitionAndSortWithinPartitions gives the
    // reference's whole-line sort; the partitioner routes on key only.
    val routed = mapped
      .map { case (k, v) => ((k, v), ()) }
      .repartitionAndSortWithinPartitions(new Md5Partitioner(spec.numReducers))
    val reduced = routed.mapPartitions { it =>
      // Streaming group-by over the sorted run (itertools.groupby analog —
      // reference `tests/testdata/exec/wc_reduce.py:26`): O(1) memory.
      new Iterator[String] {
        private val buf = it.buffered
        private var out: Iterator[String] = Iterator.empty
        private def advance(): Unit = {
          while (!out.hasNext && buf.hasNext) {
            val key = buf.head._1._1
            val vals = new Iterator[String] {
              def hasNext: Boolean = buf.hasNext && buf.head._1._1 == key
              def next(): String = buf.next()._1._2
            }
            out = spec.reducer(key, vals).iterator.toList.iterator
            // A reducer need not consume all its values (the reference
            // pipes the whole group regardless); drain the remainder so
            // the next loop iteration starts at the next key instead of
            // re-reducing this one (or spinning forever).
            while (vals.hasNext) vals.next()
          }
        }
        def hasNext: Boolean = { advance(); out.hasNext }
        def next(): String = { advance(); out.next() }
      }
    }
    spark.createDataset(reduced)
  }

  /** Write job output as the reference does: overwrite-mode text files, one
    * per reduce partition (reference `worker/__main__.py:237-250`,
    * `manager/__main__.py:344-355`). With `exactPartNames = true` the
    * output directory is byte-identical to the reference's layout: exactly
    * `numReducers` files named `part-{NNNNN}` (reference
    * `worker/__main__.py:237-238`), existing output deleted first
    * (reference `manager/__main__.py:345-355`), no `_SUCCESS`/checksum
    * droppings. */
  def runToDir(spark: SparkSession, spec: JobSpec, outputDir: String,
      exactPartNames: Boolean = false): Unit =
    if (!exactPartNames) run(spark, spec).write.mode("overwrite").text(outputDir)
    else writeExact(spark, run(spark, spec), outputDir, spec.numReducers)

  /** Commit a per-partition line dataset to `outputDir` with the
    * reference's exact `part-{NNNNN}` names. `saveAsTextFile` already
    * emits Hadoop's `part-NNNNN` (no UUID suffix) one per partition —
    * including empty partitions, matching the reference's always-R-files
    * contract — so the cleanup is just the `_SUCCESS` marker + CRCs. */
  def writeExact(spark: SparkSession, out: Dataset[String], outputDir: String,
      numReducers: Int): Unit = {
    val dir = new Path(outputDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // LocalFileSystem writes hidden .part-NNNNN.crc siblings (and hides
    // them from listStatus); turn checksums off so the directory holds
    // exactly what the reference's would.
    fs.setWriteChecksum(false)
    if (fs.exists(dir)) fs.delete(dir, true)
    out.rdd.saveAsTextFile(outputDir)
    fs.listStatus(dir).map(_.getPath)
      .filter(p => p.getName == "_SUCCESS" || p.getName.endsWith(".crc"))
      .foreach(p => fs.delete(p, false))
    require(fs.listStatus(dir).count(_.getPath.getName.startsWith("part-")) == numReducers,
      s"writeExact: expected $numReducers part files in $outputDir")
  }

  /** External-executable map stage (Hadoop-streaming compatibility,
    * reference `worker/__main__.py:167-186`): stream partition lines through
    * `command` via RDD.pipe. */
  def pipeMap(spark: SparkSession, inputDir: String, command: Seq[String],
      numMappers: Int = 0): Dataset[String] = {
    import spark.implicits._
    spark.createDataset(mapInput(spark, inputDir, numMappers).pipe(command))
  }

  /** External-executable reduce stage (reference
    * `worker/__main__.py:241-249`): md5-route each tab-KV line on its key
    * (everything before the first tab, reference `worker/__main__.py:182`),
    * whole-line-sort within each reduce partition (the reference `sort`s
    * every intermediate file, `worker/__main__.py:195-198`, and
    * `heapq.merge`s them), then stream each partition's merged run through
    * `command` once via RDD.pipe — one reducer process per partition,
    * exactly the reference's layout. Lines are kept verbatim (a line with
    * no tab reduces under itself as key, like the reference). */
  def pipeReduce(spark: SparkSession, mapped: Dataset[String], command: Seq[String],
      numReducers: Int): Dataset[String] = {
    import spark.implicits._
    val routed = mapped.rdd
      .map { line =>
        val i = line.indexOf('\t')
        val k = if (i >= 0) line.substring(0, i) else line
        ((k, line), ())
      }
      .repartitionAndSortWithinPartitions(new Md5Partitioner(numReducers))
    spark.createDataset(routed.map(_._1._2).pipe(command))
  }

  /** Full Hadoop-streaming job with EXTERNAL mapper and reducer — the
    * reference's complete user contract (`submit.py` job descriptor run
    * end-to-end): map executable over round-robin file splits, md5
    * shuffle, in-partition sort, reduce executable per partition. */
  def pipeJob(spark: SparkSession, inputDir: String, mapCmd: Seq[String],
      reduceCmd: Seq[String], numReducers: Int, numMappers: Int = 0): Dataset[String] =
    pipeReduce(spark, pipeMap(spark, inputDir, mapCmd, numMappers), reduceCmd, numReducers)
}

/** Serializable carrier for a Hadoop `Configuration` (which is not
  * `java.io.Serializable` itself) so the SESSION's configuration — with its
  * credentials and filesystem bindings — can broadcast to executors.
  * Same shape as Spark's own `private[spark] SerializableConfiguration`
  * (spark/util/SerializableConfiguration.scala), reimplemented here because
  * that class is not public API. */
final class SerializableHadoopConf(@transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

package graft.operators

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
    * (input/output/mapper/reducer/parallelism). */
  final case class JobSpec(
      inputDir: String,
      mapper: String => IterableOnce[(String, String)],
      reducer: (String, Iterator[String]) => IterableOnce[String],
      numReducers: Int)

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
    val lines = spark.read.textFile(spec.inputDir)
    val mapped = lines.rdd.flatMap(spec.mapper)
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
    * `manager/__main__.py:344-355`). */
  def runToDir(spark: SparkSession, spec: JobSpec, outputDir: String): Unit =
    run(spark, spec).write.mode("overwrite").text(outputDir)

  /** External-executable map stage (Hadoop-streaming compatibility,
    * reference `worker/__main__.py:167-186`): stream partition lines through
    * `command` via RDD.pipe. */
  def pipeMap(spark: SparkSession, inputDir: String, command: Seq[String]): Dataset[String] = {
    import spark.implicits._
    spark.createDataset(spark.read.textFile(inputDir).rdd.pipe(command))
  }
}

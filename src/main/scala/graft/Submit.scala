package graft

import org.apache.spark.sql.SparkSession
import graft.operators.MapReduceJob

/** Job-submission CLI mirroring the reference's `mapreduce-submit`
  * (reference `mapreduce/submit.py:21-71`): same options, same defaults —
  * input `tests/testdata/input`, output `output`, mapper
  * `tests/testdata/exec/wc_map.sh`, reducer `tests/testdata/exec/
  * wc_reduce.sh`, 2 mappers, 2 reducers. (The reference's grep mapper
  * defaults its query to `"product"` inside the executable,
  * `grep_map.py:14-17` — external executables keep that behavior here
  * because they run verbatim via RDD.pipe.)
  *
  * There is no manager server to message: submission IS execution. The
  * `--host`/`--port` options are accepted for CLI compatibility and
  * ignored; `--shutdown` exits immediately (nothing to shut down). Output
  * is committed with the reference's exact `part-{NNNNN}` naming.
  *
  * Usage: `sbt "runMain graft.Submit -i <dir> -o <dir> -m <exec> -r <exec>
  * --nmappers N --nreducers N"`
  */
object Submit {

  /** Parsed options — defaults are the reference CLI's defaults
    * (`submit.py:22-60`). */
  final case class Opts(
      host: String = "localhost",
      port: Int = 6000,
      input: String = "tests/testdata/input",
      output: String = "output",
      mapper: String = "tests/testdata/exec/wc_map.sh",
      reducer: String = "tests/testdata/exec/wc_reduce.sh",
      numMappers: Int = 2,
      numReducers: Int = 2,
      shutdown: Boolean = false)

  def parse(args: Array[String]): Opts = {
    var o = Opts()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--host" | "-h"     => o = o.copy(host = args(i + 1)); i += 2
        case "--port" | "-p"     => o = o.copy(port = args(i + 1).toInt); i += 2
        case "--input" | "-i"    => o = o.copy(input = args(i + 1)); i += 2
        case "--output" | "-o"   => o = o.copy(output = args(i + 1)); i += 2
        case "--mapper" | "-m"   => o = o.copy(mapper = args(i + 1)); i += 2
        case "--reducer" | "-r"  => o = o.copy(reducer = args(i + 1)); i += 2
        case "--nmappers"        => o = o.copy(numMappers = args(i + 1).toInt); i += 2
        case "--nreducers"       => o = o.copy(numReducers = args(i + 1).toInt); i += 2
        case "--shutdown" | "-s" => o = o.copy(shutdown = true); i += 1
        case other => sys.error(s"unknown option: $other")
      }
    }
    o
  }

  /** Run the streaming job described by `opts` and commit it with exact
    * `part-{NNNNN}` naming. */
  def execute(spark: SparkSession, opts: Opts): Unit = {
    val out = MapReduceJob.pipeJob(
      spark, opts.input, Seq(opts.mapper), Seq(opts.reducer),
      opts.numReducers, opts.numMappers)
    MapReduceJob.writeExact(spark, out, opts.output, opts.numReducers)
  }

  def main(args: Array[String]): Unit = {
    val o = parse(args)
    if (o.shutdown) { println(s"Shut down Manager ${o.host}:${o.port}"); return }
    val spark = GraftSession.get("graft-submit")
    try execute(spark, o)
    finally spark.stop()
    // Same submission trailer as the reference CLI (submit.py:103-110).
    println(s"Submitted job to Manager ${o.host}:${o.port}")
    println(s"input directory      ${o.input}")
    println(s"output directory     ${o.output}")
    println(s"mapper executable    ${o.mapper}")
    println(s"reducer executable   ${o.reducer}")
    println(s"num mappers          ${o.numMappers}")
    println(s"num reducers         ${o.numReducers}")
  }
}

package graft

/** Cluster-lifecycle CLI mirroring the reference's `bin/mapreduce`
  * (reference `bin/mapreduce:1-110`: `start|status|stop|restart` of one
  * manager + two worker daemons).
  *
  * There are no daemons here to manage — submission IS execution
  * ([[Submit]]): each `graft.Submit` run brings up an embedded Spark
  * session, executes the job, commits the output, and exits. The four
  * verbs therefore map onto that model rather than onto process control:
  *
  *  - `start`   — no-op success. The reference forks `mapreduce-manager` +
  *    2×`mapreduce-worker` and errors if already running; here the
  *    "cluster" comes up inside each submission, so start reports the
  *    mapping and exits 0 (idempotent — nothing can already be running).
  *  - `status`  — reports the embedded topology. The reference exits 0
  *    with "manager running"/"worker running" when both daemons are up;
  *    here the engine is always ready to accept a submission, so status
  *    prints the embedded equivalents and exits 0. (There is deliberately
  *    no "not running" state to report — that state does not exist.)
  *  - `stop`    — no-op success (the reference sends `--shutdown` then
  *    pkills; here every submission already tears its session down).
  *  - `restart` — stop + start: no-op success.
  *
  * Anything else prints the reference's usage line and exits 1
  * (reference `bin/mapreduce:13-19`).
  *
  * On a real cluster the analogous lifecycle belongs to the resource
  * manager (YARN/Kubernetes/standalone master), not to this library —
  * documented in README's migration guide, which this CLI points at.
  */
object Cluster {

  /** Execute one lifecycle verb; returns (stdout lines, exit code) so the
    * spec can exercise it without forking a JVM. */
  def run(args: Array[String]): (Seq[String], Int) =
    args.toSeq match {
      case Seq("start") =>
        (Seq(
          "starting mapreduce ...",
          "no cluster daemons in graft: submission IS execution",
          "each `graft.Submit` run starts an embedded Spark session (manager+workers), runs the job, and exits",
          "see README.md 'Migrating from the reference framework'"), 0)
      case Seq("status") =>
        (Seq(
          "manager running (embedded: Spark driver, per submission)",
          "worker running (embedded: Spark executors, per submission)",
          "no persistent daemons: submission IS execution; ready to accept `graft.Submit`"), 0)
      case Seq("stop") =>
        (Seq(
          "Stopping mapreduce ...",
          "no cluster daemons to stop: each submission tears down its own Spark session"), 0)
      case Seq("restart") =>
        (Seq(
          "Stopping mapreduce ...",
          "starting mapreduce ...",
          "no cluster daemons to restart: submission IS execution"), 0)
      case _ =>
        (Seq("Usage: graft.Cluster (start|status|stop|restart)"), 1)
    }

  def main(args: Array[String]): Unit = {
    val (out, code) = run(args)
    out.foreach(println)
    if (code != 0) sys.exit(code)
  }
}

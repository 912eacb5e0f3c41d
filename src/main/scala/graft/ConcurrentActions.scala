package graft

/** Dedicated executor for concurrent Spark ACTIONS submitted from inside
  * an operator (d10's overlapped delta materializations). Not
  * `ExecutionContext.global`: a global-pool thread is created lazily and
  * inherits whatever Spark local properties (job group, SQL execution id)
  * the first caller happened to carry — permanently, so later jobs run
  * misattributed under a stranger's job group. Threads here are created
  * per use-site wave, named, daemonized, and every submitted action is
  * expected to claim its OWN job group (see `incrementalKeepListFrom`) so
  * the job is attributed to itself and cancellable on failure of the
  * coordinating thread.
  */
object ConcurrentActions {
  val ec: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newCachedThreadPool(
        new java.util.concurrent.ThreadFactory {
          private val n = new java.util.concurrent.atomic.AtomicInteger(0)
          def newThread(r: Runnable): Thread = {
            val t = new Thread(r, s"graft-concurrent-action-${n.getAndIncrement()}")
            t.setDaemon(true)
            t
          }
        }))
}

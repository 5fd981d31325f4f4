package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Persist with automatic release: query BUILDERS legitimately persist an
  * intermediate that the finished plan consumes more than once (a rollup
  * scanned by both the median pass and the candidate pass; a synthesized
  * input read by a decision aggregate, the sort's range-sampler, and the
  * sort itself) — but a builder returns a lazy frame and never sees the
  * action, so it has no natural point to unpersist. A bare `.persist()`
  * therefore leaks a cached plan into the session for the JVM's lifetime
  * (round-3 ADVICE: Verify runs 69 queries in one session and accumulated
  * every one of them).
  *
  * [[scoped]] persists the frame and registers a one-shot
  * QueryExecutionListener that unpersists it after the FIRST completed
  * action whose analyzed plan contains this frame's plan (matched via
  * `sameResult` on canonicalized plans — object identity would miss
  * re-analysis). The cache is alive exactly while the single consuming
  * action runs, which is the builder contract: one returned frame, one
  * action. Callers that run the SAME returned frame twice fall back to
  * recomputing — correct, just uncached (Bench re-invokes the builder per
  * iteration, so each run gets a fresh scoped persist).
  *
  * The listener bus is asynchronous: release lands shortly after the
  * action returns, not synchronously with it (tests assert emptiness via
  * `eventually`).
  */
object CacheScope {

  /** Abandonment bound: a frame that is built but never executed (a
    * builder called for its oracle SQL, an explain-only path) would keep
    * its listener registered forever, charging every later action a plan
    * comparison. After this many non-matching actions the frame is
    * treated as abandoned: released and unregistered.
    */
  private val AbandonAfter = 256

  /** One shared daemon scheduler for post-release orphan sweeps (see
    * release() below) — bounded at a single idle thread however many
    * scoped frames a session builds.
    */
  private lazy val sweeper: java.util.concurrent.ScheduledThreadPoolExecutor = {
    val ex = new java.util.concurrent.ScheduledThreadPoolExecutor(1,
      (r: Runnable) => {
        val t = new Thread(r, "graft-cache-scope-sweeper")
        t.setDaemon(true)
        t
      })
    ex.setKeepAliveTime(30, java.util.concurrent.TimeUnit.SECONDS)
    ex.allowCoreThreadTimeOut(true)
    ex
  }

  def scoped(df: DataFrame): DataFrame = scopedN(df, 1)

  /** [[scoped]] generalized to a builder that KNOWS its returned/consumed
    * frame will flow through `actions` distinct completed actions before
    * the cache is dead — e.g. q78's high-value-orders frame feeds a
    * capacity count, the bloom-filter build, and the final query's
    * broadcast (3 actions, 1 scan). Release fires after the `actions`-th
    * matching action; an undercount (some consumer bypasses the listener
    * bus) degrades to the [[AbandonAfter]] bound, never a leak-forever.
    */
  def scopedN(df: DataFrame, actions: Int): DataFrame = {
    val p = df.persist()
    val spark = df.sparkSession
    val target = p.queryExecution.analyzed
    val listener: QueryExecutionListener = new QueryExecutionListener {
      private val misses = new java.util.concurrent.atomic.AtomicInteger(0)
      private val hits = new java.util.concurrent.atomic.AtomicInteger(0)
      private val released = new java.util.concurrent.atomic.AtomicBoolean(false)
      private def maybe(qe: QueryExecution): Unit = {
        val matched = qe.analyzed.exists(_.sameResult(target))
        if ((matched && hits.incrementAndGet() >= actions) ||
            (!matched && misses.incrementAndGet() > AbandonAfter)) release()
      }
      // Release is asynchronous relative to OTHER actions: the listener
      // bus lags the actions themselves, so by the time the releasing
      // event is processed a LATER action may already have been planned
      // against the live cache and be mid-materialization. Unpersisting
      // under its feet makes its InMemoryTableScan lazily REBUILD the
      // buffer through the (now entry-less) CachedRDDBuilder — an
      // orphan persisted RDD that neither a second unpersist nor
      // catalog.clearCache can ever reach. The unpersist itself stays
      // immediate (performance-proven); the fix is the follow-up: the
      // builder kill-switch captured BEFORE the entry is removed fires
      // twice from the shared sweeper, clearing any buffer an in-flight
      // action rebuilt. Idempotent, no polling, one daemon thread total.
      private def release(): Unit = if (released.compareAndSet(false, true)) {
        spark.listenerManager.unregister(this)
        val killer = org.apache.spark.sql.graft.CacheBridge.orphanKiller(p)
        p.unpersist(blocking = false)
        killer.foreach { k =>
          val shot = new Runnable { def run(): Unit = k() }
          sweeper.schedule(shot, 10, java.util.concurrent.TimeUnit.SECONDS)
          sweeper.schedule(shot, 25, java.util.concurrent.TimeUnit.SECONDS)
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = maybe(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = maybe(qe)
    }
    spark.listenerManager.register(listener)
    p
  }
}

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

  /** One shared daemon scheduler for the wall-clock BACKSTOP sweeps (see
    * [[enrollOrphan]]) — bounded at a single idle thread however many
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

  /** Released builders whose buffers an in-flight action might still
    * rebuild. Entries retire themselves: [[org.apache.spark.sql.graft
    * .CacheBridge.OrphanSweep.sweep]] returns true once no plan can
    * reach the builder (weak ref cleared) — rebuild provably impossible.
    */
  private val orphans = new java.util.concurrent.ConcurrentLinkedQueue[
    org.apache.spark.sql.graft.CacheBridge.OrphanSweep]()

  /** Hard bound on retained handles; beyond it the oldest get one final
    * shot and are dropped (weak refs — they pin nothing either way).
    */
  private val MaxOrphans = 1024

  private val sweepListenerArmed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[org.apache.spark.sql.SparkSession]()

  private def sweepOrphans(): Unit = {
    val it = orphans.iterator()
    while (it.hasNext) if (it.next().sweep()) it.remove()
  }

  /** Post-release sweeping, EVENT-ARMED (round-6 ADVICE: fixed +10s/+25s
    * delays left a window for an action slower than the last shot). A
    * rebuild can only come from an action planned while the cache was
    * live, and every engine action completes through the listener bus —
    * so sweeping on EVERY later query-end event catches the rebuild
    * whenever the rebuilding action finishes, with no timing assumption.
    * The wall-clock shots remain only as a BACKSTOP for a session that
    * goes idle with the rebuilding action's event already drained (cheap:
    * each sweep is a weak-ref deref + an idempotent no-op clear), with
    * delays configurable via `-Dgraft.cache.orphanSweepDelaysSec=10,25`.
    * Residual window: an action that hangs forever past every backstop
    * and a session with no further query events — unreachable by any
    * in-engine path.
    */
  private def enrollOrphan(spark: org.apache.spark.sql.SparkSession,
      s: org.apache.spark.sql.graft.CacheBridge.OrphanSweep): Unit = {
    s.sweep() // clear the pre-release buffer immediately
    orphans.add(s)
    while (orphans.size() > MaxOrphans)
      Option(orphans.poll()).foreach(_.sweep())
    if (sweepListenerArmed.add(spark))
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit = sweepOrphans()
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = sweepOrphans()
      })
    val delays = sys.props.get("graft.cache.orphanSweepDelaysSec")
      .map(_.split(",").toSeq.map(_.trim.toLong)).getOrElse(Seq(10L, 25L))
    delays.foreach(d => sweeper.schedule(
      new Runnable { def run(): Unit = sweepOrphans() },
      d, java.util.concurrent.TimeUnit.SECONDS))
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
      // immediate (performance-proven); the fix is the follow-up: a
      // sweep handle captured BEFORE the entry is removed enrolls in the
      // event-armed orphan registry (see enrollOrphan), which re-clears
      // the builder after every later query event until no plan can
      // reach it.
      private def release(): Unit = if (released.compareAndSet(false, true)) {
        spark.listenerManager.unregister(this)
        val sweep = org.apache.spark.sql.graft.CacheBridge.orphanSweep(p)
        p.unpersist(blocking = false)
        sweep.foreach(enrollOrphan(spark, _))
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

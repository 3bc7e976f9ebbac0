package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/**
 * One-shot per-session cleanup hooks for graft's session-keyed
 * registries ([[Checkpoints]], the [[Queries]] table/edge memos, the
 * dedup-tier memos in [[NorthStar]]).
 *
 * Why a listener and not a sweep: the registries used to call a
 * `sweepStopped()` map walk on every lookup, which (a) put a
 * keys-traversal + `sparkContext.isStopped` probe on the hottest call
 * paths (every `t()` table read, every tracked checkpoint), and (b)
 * still retained a stopped session forever when no LATER graft call
 * happened to run the sweep — the round-10 ADVICE retention note. An
 * `onApplicationEnd` listener inverts control: the context itself
 * triggers the cleanup exactly once at stop, the hot paths carry
 * zero bookkeeping, and a session that stops silently is still freed.
 *
 * Registration is idempotent per (tag, session); a hook registered on
 * an already-stopped context runs immediately (the listener bus no
 * longer dispatches after stop, so deferring would re-open the leak).
 */
private[graft] object SessionScope {
  private val hooked = scala.collection.concurrent.TrieMap
    .empty[(String, SparkSession), Unit]

  /** Run `cleanup` when `s`'s SparkContext ends. Idempotent per
    * (tag, session); `cleanup` must tolerate running at most once and
    * must not touch executor state (the context is already down). */
  def onStop(tag: String, s: SparkSession)(cleanup: () => Unit): Unit =
    hooked.getOrElseUpdate((tag, s), {
      if (s.sparkContext.isStopped) {
        hooked.remove((tag, s))
        cleanup()
      } else {
        s.sparkContext.addSparkListener(new SparkListener {
          override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
            hooked.remove((tag, s))
            cleanup()
          }
        })
      }
    })

  /** Test probe: hooks registered and not yet fired. */
  private[graft] def pendingHooks: Int = hooked.size
}

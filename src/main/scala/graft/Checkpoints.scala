package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Deterministic lifecycle for `localCheckpoint()` storage.
 *
 * A local checkpoint materializes a DataFrame as persisted executor
 * blocks and TRUNCATES its lineage — the right move inside iterative
 * and multi-branch operators (kCore, LPA, linkPredict,
 * bandedHammingPairs), but the blocks outlive the call: Spark only
 * frees them when the ContextCleaner happens to GC the underlying RDD,
 * so repeated invocations in a long-lived session accumulate executor
 * storage (the round-9 verdict's leak). This registry makes release
 * explicit and chains it into the one cache lifecycle the query
 * surface already has ([[Queries.releaseCaches]] ←
 * [[NorthStar.releaseCaches]]).
 *
 * Two call shapes:
 *  - [[tracked]] — checkpoint AND register: for tables the operator's
 *    RESULT still references (the result plan reads the checkpointed
 *    blocks lazily, so they must survive until the session is done
 *    with the corpus). Freed by [[release]].
 *  - [[free]] — immediate unpersist: for per-round tables an iterative
 *    loop has SUPERSEDED (the next round's eager checkpoint no longer
 *    reads them). Callers free a round only after the successor round
 *    materialized.
 *
 * Contract on [[release]]: checkpoint blocks are the ONLY copy of
 * their data (lineage is gone) — a result DataFrame obtained from a
 * tracked operator must be materialized (collected / written) before
 * release; re-executing it afterwards fails rather than silently
 * recomputing. That is the same moment the persisted memo tables are
 * dropped, so the lifecycle point is unchanged for callers.
 *
 * Keys are session-only (not (session, dir)): a checkpoint block
 * carries no corpus identity (operators like [[operators.Graph.kCore]]
 * call [[tracked]] on an arbitrary edge DataFrame with no corpus path
 * in sight), so [[release]] is necessarily SESSION-wide — see the
 * warning at [[NorthStar.releaseCaches]] for the one caller-visible
 * consequence (a dir-scoped release still frees the other dir's
 * tracked checkpoints in the same session).
 */
object Checkpoints {
  private val live = scala.collection.concurrent.TrieMap
    .empty[SparkSession, java.util.concurrent.ConcurrentLinkedQueue[DataFrame]]

  /** Eagerly localCheckpoint `df` and register the blocks for release
    * via [[release]]. A stopped session's entry is dropped by its
    * [[SessionScope]] hook (its blocks died with the context) — the
    * hot path carries no sweep. */
  def tracked(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    val s = cp.sparkSession
    live.getOrElseUpdate(s, {
      SessionScope.onStop("checkpoints", s)(() => live.remove(s))
      new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    }).add(cp)
    cp
  }

  /** Unpersist the checkpointed blocks behind `cp` NOW (asynchronous
    * block removal — the RDD id is freed from the persistent-RDD map
    * immediately). Safe only once nothing will re-read `cp`. */
  def free(cp: DataFrame): Unit =
    org.apache.spark.sql.GraftBridge.checkpointRdds(cp)
      .foreach(_.unpersist(blocking = false))

  /** Release every tracked checkpoint of `s` (no-op for sessions with
    * none). Chained from [[Queries.releaseCaches]]. */
  def release(s: SparkSession): Unit =
    live.remove(s).foreach { q =>
      var cp = q.poll()
      while (cp != null) { free(cp); cp = q.poll() }
    }

  /** Test probe: is `s` currently holding tracked checkpoints? */
  private[graft] def isTracking(s: SparkSession): Boolean = live.contains(s)
}

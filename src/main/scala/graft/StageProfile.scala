package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/**
 * Stage-level honesty probe — the diagnostic behind round 11's two
 * measured lessons (BASELINE.md): wall-clock alone cannot distinguish
 * "the plan is efficient" from "Catalyst eliminated the work under
 * count()" or "AQE serialized a CPU-bound stage onto one task".
 *
 * For each named query this main runs `count()` once warm and reports
 * per-stage ground truth from the task metrics: task count, executor
 * run/CPU time, shuffle rows in/out, and scan input rows. Read it for
 * two smells:
 *  - a stage with `tasks=1..3` and run time ≫ its share of wall —
 *    byte-based AQE coalescing serialized a tiny-bytes/heavy-CPU
 *    exchange (fix: explicit-count repartition at the exchange);
 *  - far fewer executed stages than the plan's exchanges — the action
 *    optimized work away (join elimination under count()), so the
 *    bench time is NOT evidence about the full plan.
 *
 * Usage: `runMain graft.StageProfile [sfDir] [q1,q2,...]`
 * (defaults: sf0.1, the current bench top-costs). Dev tool — never run
 * by the driver; session config mirrors Bench so numbers transfer.
 */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("d09_editdist_pairs", "d16_corpus_release", "g08_kcore",
        "g12_ppr", "g05_triangles", "s10_ann_bucketed")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shared engine config ([[SessionDefaults]]) — "session config
    // mirrors Bench so numbers transfer" is now enforced structurally
    val spark = SessionDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val stages =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = (for { a <- i.completionTime; b <- i.submissionTime }
          yield a - b).getOrElse(-1L)
        val tm = i.taskMetrics
        stages.add((i.stageId, ms,
          f"tasks=${i.numTasks} run=${tm.executorRunTime}ms " +
          f"cpu=${tm.executorCpuTime / 1000000}ms " +
          f"srRows=${tm.shuffleReadMetrics.recordsRead} " +
          f"swRows=${tm.shuffleWriteMetrics.recordsWritten} " +
          f"in=${tm.inputMetrics.recordsRead}"))
      }
    })

    import scala.jdk.CollectionConverters._
    // 3rd arg `noop`: drive through the noop sink instead of count() —
    // count() prunes prunable final projections AND cardinality-
    // preserving joins (left-join elimination), so map-only kernels and
    // spine-join probe sides never run under it (the wave9 lesson)
    val useNoop = args.length > 2 && args(2) == "noop"
    def drive(df: org.apache.spark.sql.DataFrame): Unit =
      if (useNoop) df.write.mode("overwrite").format("noop").save()
      else { df.count(); () }
    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      drive(fn(spark, sfDir)) // warm: JIT + memo builds out of the window
      stages.clear()
      val t0 = System.nanoTime()
      drive(fn(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      // stage-completion events are async; give the bus a beat to drain
      Thread.sleep(400)
      val ss = stages.asScala.toSeq
      println(f"QUERY $name wall=$wall%.2f stages=${ss.size} " +
        f"stageMs=${ss.map(_._2).sum}")
      ss.sortBy(-_._2).take(8).foreach { case (id, ms, d) =>
        println(s"  STAGE $id ${ms}ms $d")
      }
      NorthStar.releaseCaches(spark, sfDir)
    }
    spark.stop()
  }
}

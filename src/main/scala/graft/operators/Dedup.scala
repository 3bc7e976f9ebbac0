package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.{TextFunctions => TF}

/**
 * Near-duplicate detection operators over a document table — the reusable
 * library surface behind the d03/d04 harness queries (SURVEY.md §7.1 M5).
 * Both return (doc_a, doc_b, jaccard) for pairs with exact n-gram-shingle
 * Jaccard ≥ threshold; they differ in how candidates are found:
 *
 *  - [[jaccardPairsExact]]: prefix filtering (AllPairs/PPJoin family —
 *    Bayardo et al., "Scaling Up All Pairs Similarity Search", WWW'07).
 *    EXACT: zero recall loss, guaranteed. The ground-truth path.
 *  - [[minhashLshPairs]]: MinHash signatures + banded LSH + signature-
 *    estimate prefilter. Probabilistic recall (1−(1−J^r)^bands, ≈1−5e−8
 *    at J=0.8 with the defaults), near-linear candidate volume. The
 *    100 TB path.
 *
 * Output jaccard is always the exact inter/(na+nb−inter) over distinct
 * shingle sets (integer sizes, one double division) — identical arithmetic
 * to a SQL oracle.
 */
object Dedup {

  /**
   * (doc_id, sh): id + distinct word-n-gram shingle array. Two-step on
   * purpose: tokenization is materialized (cached) BEFORE the shingle
   * lambda, so the regex tokenizer runs once per document — an inline
   * `shingles(text)` would re-tokenize per shingle position (measured
   * ~50× slower on the harness corpus).
   */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), TF.tokens(col(textCol)).as("tk"))
      .persist()
      .select(col("doc_id"), TF.shinglesFromTokens(col("tk"), n).as("sh"))

  /**
   * Exact Jaccard pairs ≥ threshold via prefix filtering: under a global
   * rarity order on shingles, any pair with J ≥ t must share one of the
   * first n − ⌈t·n⌉ + 1 shingles of each side, so joining only on those
   * prefix shingles loses nothing while shrinking the candidate join from
   * Σ df² (quadratic in a hot shingle's document frequency) to the
   * rare-prefix join.
   *
   * Scale shape: df counting and prefix ranking are ordinary shuffles on
   * (shingle) and (doc_id); nothing is quadratic in df, and exact
   * verification touches only candidate pairs.
   */
  def jaccardPairsExact(docs: DataFrame, idCol: String, textCol: String,
                        threshold: Double, n: Int = 3): DataFrame = {
    // materialize shingles ONCE: the table feeds the df-rank, the prefix
    // join, and both sides of the verification join — without the cache
    // the optimizer is free to re-derive shingles from text at any of
    // those sites (including per joined row), which is where the
    // tokenization cost explodes
    val base = shingleTable(docs, idCol, textCol, n).persist()
    val sh = base.select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
    val dfreq = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    // prefix length n − ⌈t·n⌉ + 1; the epsilon keeps ⌈·⌉ from rounding an
    // exact t·n UP under FP error (a longer prefix is always safe)
    val prefix = sh.join(dfreq, "s")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))))
      .filter(col("rn") <= col("n") - ceil(col("n") * threshold - 1e-6) + 1)
      .select(col("doc_id"), col("s"))
      .persist() // feeds BOTH sides of the self-join below
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    exactVerify(cand, base, threshold)
  }

  /**
   * MinHash + banded LSH near-dup pairs: k minhashes from once-hashed
   * shingles (both cached), candidates from the (band, band-hash)
   * equi-join, a signature-estimated Jaccard prefilter (O(k) per pair, no
   * shingle rehydration), exact verification last. Banding math at
   * r = k/bands: P(candidate | J) = 1 − (1 − J^r)^bands.
   */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double, n: Int = 3, k: Int = 128,
                      bands: Int = 32, estFloor: Double = 0.6): DataFrame = {
    // cached for the same reason as in jaccardPairsExact: the exact-verify
    // join must read materialized shingle arrays, never re-tokenize
    val base = shingleTable(docs, idCol, textCol, n).persist()
    val sig = base
      .select(col("doc_id"), TF.shingleHashes(col("sh")).as("h0"))
      .persist()
      .select(col("doc_id"), TF.minhashFromHashes(col("h0"), k).as("sig"))
      .persist()
    val banded = sig.select(col("doc_id"),
      posexplode(TF.lshBandHashes(col("sig"), k, bands)).as(Seq("band", "bh")))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val survivors = cand
      .repartition(col("doc_a")) // keep the O(k)-per-row estimate stage parallel
      .join(sig.toDF("doc_a", "sig_a"), "doc_a")
      .join(sig.toDF("doc_b", "sig_b"), "doc_b")
      .filter(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
        m => m)).cast(DoubleType) / k >= estFloor)
      .select(col("doc_a"), col("doc_b"))
    exactVerify(survivors, base, threshold)
  }

  /**
   * Join candidate (doc_a, doc_b) pairs back to the full shingle arrays
   * and keep exact Jaccard ≥ t. The explicit repartition matters: the
   * candidate shuffle is only a few MB, so AQE's bytes-based coalescing
   * would fold it into one partition — but each row here costs an
   * array_intersect over two ~50-string arrays, so the stage is CPU-bound
   * and must stay spread across the cluster. One intersect per pair;
   * jaccard = inter/(na+nb−inter), the oracle's exact arithmetic.
   */
  private def exactVerify(cand: DataFrame, base: DataFrame, threshold: Double): DataFrame =
    cand
      .repartition(col("doc_a"))
      .join(base.toDF("doc_a", "sh_a"), "doc_a")
      .join(base.toDF("doc_b", "sh_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter"),
        size(col("sh_a")).as("na"), size(col("sh_b")).as("nb"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast(DoubleType) / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /**
   * Group near-duplicate pairs into duplicate CLUSTERS — the stage after
   * pair detection in an LLM-data dedup pipeline (keep one doc per
   * cluster): connected components over the pair graph, component = min
   * doc_id in the cluster.
   *
   * Size-adaptive strategy: an iterative distributed algorithm costs
   * O(log diameter) rounds of jobs, which is pure scheduling overhead
   * when the pair graph is small — near-dup pairs are typically a tiny
   * fraction of the corpus even at 100 TB. Below `localEdgeThreshold`
   * edges (an explicit, documented driver-memory bound) the graph is
   * collected and solved with union-find in one pass; above it, the
   * shuffle-based min-label propagation loop runs with no driver state.
   */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25,
                          localEdgeThreshold: Long = 4000000L): DataFrame = {
    val p = pairs.persist() // read twice: the size dispatch + the solve
    if (p.count() <= localEdgeThreshold) connectedComponentsLocal(p)
    else connectedComponentsDistributed(p, maxIter)
  }

  /** Small-graph path: one collect (bounded by the caller's threshold),
    * union-find with path compression, min root wins. */
  private[graft] def connectedComponentsLocal(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val out = parent.keys.toSeq.map(x => (x, find(x))).sorted
    spark.createDataset(out).toDF("doc_id", "component")
  }

  /** Large-graph path: iterative min-label propagation (one join + one
    * min-agg per round halves the component diameter; O(log diameter)
    * rounds). localCheckpoint truncates plan lineage each round. */
  private[graft] def connectedComponentsDistributed(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    // localCheckpoint (eager) truncates the per-iteration plan lineage —
    // without it the logical plan and its analysis cost grow linearly
    // with iterations, the classic iterative-algorithm trap
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()
    // convergence signal: labels only ever decrease per node, so
    // sum(component) is strictly decreasing until fixpoint — one cheap
    // agg per round instead of a join-and-count of changed rows
    def checksum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("component").cast("decimal(38,0)"))).head().getDecimal(0)
    var last = checksum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // each node adopts min(own label, neighbors' labels)
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("component"))
      labels = labels.union(viaNeighbor)
        .groupBy(col("id")).agg(min(col("component")).as("component"))
        .localCheckpoint()
      val cur = checksum(labels)
      converged = cur.compareTo(last) == 0
      last = cur
      i += 1
    }
    edges.unpersist()
    labels.select(col("id").as("doc_id"), col("component"))
  }
}

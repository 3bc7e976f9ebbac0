package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}

/**
 * Bucketed (sub-quadratic) batch k-NN join over an embedding column —
 * the scale path for all-pairs neighbor search on CLUSTERED corpora.
 *
 * Beyond-reference operator (the reference pipeline,
 * `codes/weather_etl_pipeline.py`, has no vector surface at all); this
 * is the candidate-generation form a 100 TB embedding corpus needs:
 * the plain sketch cascade (s06) ranks EVERY pair by Hamming sketch —
 * a better constant than exact scoring, but still O(n²) pair touches.
 * Real embedding corpora are clustered (topics, templates, sources),
 * and on clustered data coarse quantization prunes the pair space
 * itself: vectors are assigned to their `probes` nearest of `nCells`
 * deterministic coarse centroids (IVF-style, Jégou TPAMI'11), and only
 * pairs CO-RESIDENT in at least one cell become candidates. With cell
 * count scaled to corpus size (nCells ≈ n / targetCellSize), candidate
 * volume grows ~linearly in n, not quadratically — the measured
 * evidence lives in SCALE.md (clustered dry-run: candidate fraction,
 * recall vs the exact join, wall time vs the all-pairs cascade).
 *
 * Dataflow (all shuffles on pruned sets):
 *  1. cell assignment: per-row argmax-dot over nCells deterministic
 *     centroids, top-`probes` cells — a pure codegen'd projection
 *     (array_sort over (−dot, cell) structs), NO shuffle, no driver
 *     state. Multi-probe (probes ≥ 2) covers cluster-boundary pairs
 *     whose members straddle two Voronoi cells.
 *  2. candidate pairs: self-equi-join of the (id, cell) table on cell
 *     (shuffle keyed by cell — the d04 LSH-band shape), id_l < id_r,
 *     then a distinct: a pair sharing several probed cells appears at
 *     most probes² times, so the dedup shuffles only the PRUNED pair
 *     set, never the n² space. A hot cell (m members) contributes
 *     m·(m−1)/2 pairs through one key — at scale pick nCells so the
 *     expected cell size stays bounded (AQE skew-join splits moderate
 *     stragglers; the knob is the same as d04's band width).
 *  3. Hamming rank: candidates join the 512-bit sign-sketch table
 *     (BitSignature — 8 longs/row), per-query top-`cands` by
 *     (hamming, neighbor) off bounded TopKPerKey heaps.
 *  4. exact rerank: the n·cands survivors get true cosines, per-query
 *     top-`k` by (score desc, neighbor).
 *
 * Recall is corpus-dependent by design: on clustered data a true
 * neighbor pair is co-clustered and lands in the same cell with
 * probability → 1 (law-tested ≥ 0.95 vs the exact join on a 64-cluster
 * synthetic corpus); on ISOTROPIC data space partitioning has no
 * pruning power at the relevant angles (measured round 5: 16-cell
 * 8-probe IVF needs 94% of pairs for 0.95 recall) — use the all-pairs
 * sketch cascade (s06) there. The s10 harness entry runs this cascade
 * on the harness corpus with its oracle replaying every stage, so
 * correctness of the composition is hash-verified independently of the
 * corpus's clusteredness.
 */
object AnnJoin {

  /** (id, cell) rows: each vector's `probes` nearest of `nCells`
    * deterministic coarse centroids by dot (ties → smaller cell id).
    * Pure projection — no shuffle, no collected state. */
  def cellAssignments(emb: DataFrame, idCol: String, vecCol: String,
                      dim: Int, nCells: Int, probes: Int): DataFrame = {
    require(probes >= 1 && probes <= nCells, "need 1 <= probes <= nCells")
    val v = VF.toDouble(col(vecCol))
    // (−dot, cell) structs: ascending array_sort = descending dot with
    // deterministic cell-id tiebreak, entirely inside codegen
    val entries = array((0 until nCells).map { c =>
      struct((lit(0.0) - VF.dot(v, lit(VF.centroid(c, dim)))).as("nd"),
        lit(c).as("cell"))
    }: _*)
    emb.select(col(idCol).as("id"), explode(slice(array_sort(entries), 1, probes)).as("e"))
      .select(col("id"), col("e.cell").as("cell"))
  }

  /** Undirected candidate pairs (id_l < id_r) co-resident in ≥1 cell.
    * The distinct collapses multi-cell co-residence (≤ probes² copies)
    * and shuffles only the pruned pair set. The cell-keyed exchange is
    * PINNED to defaultParallelism: cell rows are tiny BYTES but the
    * self-join emits quadratic-per-cell pairs, and AQE's byte-based
    * coalescing otherwise serializes that fan-out onto 1–3 tasks
    * (the s04/e01/s06 block-join lesson applied to the cell join). */
  def candidatePairs(cells: DataFrame): DataFrame = {
    val par = cells.sparkSession.sparkContext.defaultParallelism
    cells.select(col("id").as("id_l"), col("cell"))
      .repartition(par, col("cell"))
      .join(cells.select(col("id").as("id_r"), col("cell"))
        .repartition(par, col("cell")), Seq("cell"))
      .filter(col("id_l") < col("id_r"))
      .select(col("id_l"), col("id_r"))
      // count-pinned exchange UNDER the dedup (r17 stage metrics: the
      // bare distinct's reduce side AQE-coalesced the pruned pair set —
      // tiny bytes — onto 3 tasks, and every downstream consumer (sig
      // joins, hamming, heap partials) inherited that serialized
      // layout). hash(id_l, id_r) satisfies the dedup agg's required
      // distribution, so the dedup AND the consumer stage above it run
      // `par`-way with no additional exchange. Cost: multi-cell
      // co-residence dups (≤ probes², measured ~4% at the harness
      // probes=2) ship un-collapsed — the partial-agg saving they'd get
      // from a map-side dedup is far below the 10× parallelism lost.
      .repartition(par, col("id_l"), col("id_r"))
      .distinct()
  }

  /**
   * The full bucketed cascade: cells → candidate pairs → Hamming
   * top-`cands` per query → exact-cosine top-`k` per query.
   * `sig` must carry (vec_id, sig) with sig = BitSignature(vec, dim,
   * nBits) — pass a persisted/precomputed sketch table so signatures
   * are built once per corpus, not once per join.
   * Output: (vec_id, neighbor_id, score) — both orientations of every
   * surviving pair, exactly the s04/s06 surface.
   */
  def bucketedKnnJoin(emb: DataFrame, sig: DataFrame, idCol: String,
                      vecCol: String, dim: Int, nCells: Int, probes: Int,
                      cands: Int, k: Int): DataFrame = {
    val e = emb.select(col(idCol).as("vec_id"), VF.toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", sqrt(VF.normSq(col("v"))))
    val cand0 = candidatePairs(
      cellAssignments(emb, idCol, vecCol, dim, nCells, probes))
    val hams = cand0
      .join(sig.select(col("vec_id").as("id_l"), col("sig").as("sig_l")), Seq("id_l"))
      .join(sig.select(col("vec_id").as("id_r"), col("sig").as("sig_r")), Seq("id_r"))
      .select(col("id_l"), col("id_r"),
        VF.hammingSig(col("sig_l"), col("sig_r")).as("ham"))
    // both orientations from the same pass (see s04's explode note)
    val oriented = hams
      .select(explode(array(
        struct(col("id_l").as("vec_id"), col("id_r").as("neighbor_id"), col("ham")),
        struct(col("id_r").as("vec_id"), col("id_l").as("neighbor_id"), col("ham"))))
        .as("p"))
      .select(col("p.vec_id"), col("p.neighbor_id"), col("p.ham"))
    val cand = Relational.topKPerKey(oriented, Seq("vec_id"),
      Seq(col("ham").asc, col("neighbor_id").asc), cands)
    val rerank = cand
      .join(e.select(col("vec_id"), col("v").as("v_q"), col("nrm").as("nrm_q")),
        Seq("vec_id"))
      .join(e.select(col("vec_id").as("neighbor_id"), col("v").as("v_n"),
        col("nrm").as("nrm_n")), Seq("neighbor_id"))
      .select(col("vec_id"), col("neighbor_id"),
        (VF.dot(col("v_q"), col("v_n")) / (col("nrm_q") * col("nrm_n")))
          .as("score"))
    Relational.topKPerKey(rerank, Seq("vec_id"),
      Seq(col("score").desc, col("neighbor_id").asc), k)
      .select(col("vec_id"), col("neighbor_id"), col("score"))
  }

  /**
   * Two-corpus bucketed k-NN retrieval: for every row of `queries`, the
   * top-`k` cosine neighbors among `index` — the batch-retrieval shape
   * (RAG context mining, hard-negative mining, corpus alignment). The
   * incremental probe (s07) broadcasts a SMALL arrival batch against
   * the whole index; this is the form for when BOTH sides are large:
   * cells bucket each side independently (same deterministic
   * centroids), only co-resident (query, index) pairs are
   * hamming-ranked, and candidates track |queries|·cellSize instead of
   * |queries|·|index|. Output: (vec_id, neighbor_id, score), query
   * orientation only. Sides must not share ids' SEMANTICS — neighbor
   * ids are index ids. `sigQ`/`sigI` carry (vec_id, sig) per side
   * (pass precomputed/artifact tables — see AnnIndex).
   */
  def bucketedKnnJoinAgainst(queries: DataFrame, index: DataFrame,
                             sigQ: DataFrame, sigI: DataFrame,
                             idCol: String, vecCol: String, dim: Int,
                             nCells: Int, probes: Int,
                             cands: Int, k: Int): DataFrame = {
    def vecs(df: DataFrame) =
      df.select(col(idCol).as("vec_id"), VF.toDouble(col(vecCol)).as("v"))
        .withColumn("nrm", sqrt(VF.normSq(col("v"))))
    val qCells = cellAssignments(queries, idCol, vecCol, dim, nCells, probes)
      .select(col("id").as("vec_id"), col("cell"))
    val iCells = cellAssignments(index, idCol, vecCol, dim, nCells, probes)
      .select(col("id").as("neighbor_id"), col("cell"))
    // NO pinned exchange under this distinct (r17, measured): the
    // [[candidatePairs]] pin was tried here and ran ~0.3 s SLOWER at the
    // harness scale — the retrieval side's candidate volume is
    // |queries|·cellSize (query batches are bounded), so the scoring CPU
    // above the dedup is tens of ms and the added exchange costs more
    // than the parallelism buys. The self-join cascade (s10) keeps the
    // pin because its pair volume is corpus×cellSize.
    val cand0 = qCells.join(iCells, Seq("cell"))
      .select(col("vec_id"), col("neighbor_id")).distinct()
    val hams = cand0
      .join(sigQ.select(col("vec_id"), col("sig").as("sig_q")), Seq("vec_id"))
      .join(sigI.select(col("vec_id").as("neighbor_id"),
        col("sig").as("sig_i")), Seq("neighbor_id"))
      .select(col("vec_id"), col("neighbor_id"),
        VF.hammingSig(col("sig_q"), col("sig_i")).as("ham"))
    val cand = Relational.topKPerKey(hams, Seq("vec_id"),
      Seq(col("ham").asc, col("neighbor_id").asc), cands)
    val rerank = cand
      .join(vecs(queries).select(col("vec_id"), col("v").as("v_q"),
        col("nrm").as("nrm_q")), Seq("vec_id"))
      .join(vecs(index).select(col("vec_id").as("neighbor_id"),
        col("v").as("v_n"), col("nrm").as("nrm_n")), Seq("neighbor_id"))
      .select(col("vec_id"), col("neighbor_id"),
        (VF.dot(col("v_q"), col("v_n")) / (col("nrm_q") * col("nrm_n")))
          .as("score"))
    Relational.topKPerKey(rerank, Seq("vec_id"),
      Seq(col("score").desc, col("neighbor_id").asc), k)
      .select(col("vec_id"), col("neighbor_id"), col("score"))
  }
}

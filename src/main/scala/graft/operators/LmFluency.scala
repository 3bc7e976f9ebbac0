package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.{TextFunctions => TF}

/**
 * Bigram-LM fluency scoring — the CCNet/KenLM quality stage of a
 * training-data pipeline, shared verbatim by the t39 harness query,
 * the d26 verdict composition, and CorpusPipeline's optional
 * `lmFluency` stage (one body, so the composition cannot drift from
 * the oracle-verified query).
 *
 * Deliberately log-free (t13/t32's reason: libm ln/exp are not
 * bit-stable across engines, so true perplexity can't sit in a
 * hash-checked contract): each transition's add-one smoothed INVERSE
 * probability (c(w1)+V)/(c(w1,w2)+1) is taken in truncating integer
 * division and summed — `ppx_proxy`, the mean inverse probability, is
 * perplexity's arithmetic-mean cousin — alongside exact LM-coverage
 * counts (n_hit, n_oov_ctx). Every per-doc number stays an integer
 * until ONE final IEEE divide, and the keep gate (≥ 3/4 of transitions
 * LM-covered) is decided in cross-multiplied integer form.
 *
 * Distributed shape: both LM tables are reference-slice-vocabulary-
 * sized and BROADCAST (bounded by the curated reference corpus, not
 * the scored corpus — measured 914→961 bigrams across a 100× corpus,
 * SCALE.md wave11), the one-row vocabulary size rides a broadcast
 * cross join, so scoring is map-side over the posexplode'd transitions
 * — the only exchanges are the LM-build aggs (reference slice only)
 * and the per-doc count agg keyed by the id. Docs with < 2 tokens
 * surface with zero counts via the left spine join, not silently
 * dropped by the explode. At 100 TB: an LM trained on a curated
 * reference stays broadcastable by construction; for an LM trained on
 * the full corpus, prune to the top-K n-grams first (the quantized
 * KenLM shape) to keep the broadcast, else the probe degrades to a
 * sort-merge join keyed by the gram.
 */
object LmFluency {

  /** Transitions (id?, w1, w2) via posexplode + a parent-array index —
    * NOT transform(sequence, struct(...)): building the array-of-struct
    * pair list copies every token's bytes into per-doc UnsafeArrayData
    * before Generate unrolls it (measured 99 s cpu for 24M transitions
    * at the 100x study scale; the posexplode form reads the
    * already-materialized token array in place). */
  private def transitions(tk: DataFrame, keep: Seq[String]): DataFrame =
    tk.filter(size(col("tks")) >= 2)
      .select(keep.map(col) :+ col("tks") :+
        posexplode(col("tks")).as(Seq("i", "w1")): _*)
      .filter(col("i") < size(col("tks")) - 1)
      .select(keep.map(col) :+ col("w1") :+
        col("tks").getItem(col("i") + 1).as("w2"): _*)

  /** A trained bigram LM: the bigram counts, their w1-marginal context
    * counts, and the one-row vocabulary size — all reference-slice-
    * vocabulary-sized (broadcastable by construction). Train ONCE and
    * reuse across [[scoreWith]] calls (the streaming gate's shape: the
    * reference is static, every micro-batch probes the same tables);
    * [[persisted]] pins the three frames in the cache for that reuse. */
  final case class Model(bigrams: DataFrame, contexts: DataFrame,
                         vocab: DataFrame) {
    def persisted(): Model = {
      bigrams.persist(); contexts.persist(); vocab.persist(); this
    }
    def unpersist(): Unit = {
      bigrams.unpersist(); contexts.unpersist(); vocab.unpersist()
    }
  }

  /** Train the bigram LM on `refDocs` (the curated reference slice —
    * ALL its rows, not a quality-gated subset: the reference is given). */
  def train(refDocs: DataFrame, textCol: String = "text"): Model = {
    // r17: spread the reference slice before tokenizing — a source
    // filter (e.g. `source = 'src0'`) pushes below any upstream spread
    // to the file scan, so the whole tokenize+transition explode of the
    // LM build otherwise lands on the scan's task layout (measured: ONE
    // task, ~0.26 s per d26 evaluation at sf0.1). The reference slice
    // is bounded by contract, so this exchange ships a small curated
    // corpus once and the build runs cluster-wide. Row-to-partition
    // assignment cannot affect the result (all outputs are aggregates).
    val rtk = refDocs
      .repartition(refDocs.sparkSession.sparkContext.defaultParallelism)
      .select(TF.tokens(col(textCol)).as("tks"))
    val rtr = transitions(rtk, Seq.empty)
    val big = rtr.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    // context counts are the bigram table's w1-marginal — deriving them
    // by summation (vs re-exploding the reference slice) drops a whole
    // scan+Generate+exchange subtree from the LM build
    val ctx = big.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val voc = rtk.select(explode(col("tks")).as("t"))
      .agg(count_distinct(col("t")).as("v"))
    Model(big, ctx, voc)
  }

  /**
   * Score every `scoreDocs` row against a bigram LM trained on
   * `refDocs`. Returns one row per `scoreDocs` id: (idCol, n_trans,
   * n_hit, n_oov_ctx, inv_p_sum, hit_ratio, ppx_proxy, keep) — t39's
   * exact output contract. Composition of [[train]] and [[scoreWith]]
   * (the SAME fragments — batch query, d26 verdict, CorpusPipeline
   * stage, and the streaming gate all run one body).
   */
  def score(refDocs: DataFrame, scoreDocs: DataFrame,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    scoreWith(train(refDocs, textCol), scoreDocs, idCol, textCol)

  /** The probe side of [[score]] against an already-trained [[Model]]. */
  def scoreWith(m: Model, scoreDocs: DataFrame,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val stk = scoreDocs.select(col(idCol), TF.tokens(col(textCol)).as("tks"))
    val per = transitions(stk, Seq(idCol))
      .join(broadcast(m.bigrams), Seq("w1", "w2"), "left")
      .join(broadcast(m.contexts), Seq("w1"), "left")
      .crossJoin(broadcast(m.vocab))
      .select(col(idCol),
        col("c2").isNotNull.cast(LongType).as("hit"),
        col("c1").isNull.cast(LongType).as("oov"),
        expr("(coalesce(c1, 0L) + v) div (coalesce(c2, 0L) + 1L)")
          .as("invp"))
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_trans"), sum(col("hit")).as("n_hit"),
        sum(col("oov")).as("n_oov_ctx"), sum(col("invp")).as("inv_p_sum"))
    scoreDocs.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trans"), lit(0L)).as("n_trans"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        coalesce(col("n_oov_ctx"), lit(0L)).as("n_oov_ctx"),
        coalesce(col("inv_p_sum"), lit(0L)).as("inv_p_sum"),
        coalesce(col("n_hit").cast("double") / col("n_trans"), lit(0.0))
          .as("hit_ratio"),
        coalesce(col("inv_p_sum").cast("double") / col("n_trans"),
          lit(0.0)).as("ppx_proxy"),
        (coalesce(col("n_trans"), lit(0L)) > 0 &&
          coalesce(col("n_hit"), lit(0L)) * 4 >=
            coalesce(col("n_trans"), lit(0L)) * 3).as("keep"))
  }
}

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

  /** (doc_id, sh): id + distinct word-n-gram shingle array. */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), TF.shingles(col(textCol), n).as("sh"))

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
    val base = shingleTable(docs, idCol, textCol, n)
    val sh = base.select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
    val dfreq = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    // prefix length n − ⌈t·n⌉ + 1; the epsilon keeps ⌈·⌉ from rounding an
    // exact t·n UP under FP error (a longer prefix is always safe)
    val prefix = sh.join(dfreq, "s")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))))
      .filter(col("rn") <= col("n") - ceil(col("n") * threshold - 1e-6) + 1)
      .select(col("doc_id"), col("s"))
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
    val base = shingleTable(docs, idCol, textCol, n)
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
      .join(sig.toDF("doc_a", "sig_a"), "doc_a")
      .join(sig.toDF("doc_b", "sig_b"), "doc_b")
      .filter(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
        m => m)).cast(DoubleType) / k >= estFloor)
      .select(col("doc_a"), col("doc_b"))
    exactVerify(survivors, base, threshold)
  }

  /**
   * Join candidate (doc_a, doc_b) pairs back to the full shingle arrays
   * and keep exact Jaccard ≥ t.
   */
  private def exactVerify(cand: DataFrame, base: DataFrame, threshold: Double): DataFrame =
    cand
      .join(base.toDF("doc_a", "sh_a"), "doc_a")
      .join(base.toDF("doc_b", "sh_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        TF.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
}

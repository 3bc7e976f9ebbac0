package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Vector similarity surface over embedding columns (`array<float>`)
 * — SURVEY.md §7.1 M5. Built-in higher-order functions only
 * (`zip_with`/`transform`/`aggregate`): codegen'd, no UDF, no shuffle for
 * the scoring projection.
 *
 * Numeric contract: all arithmetic in double with a pinned left-to-right
 * fold order, so scores are bit-identical to an oracle that folds the
 * same way (DuckDB `list_reduce`).
 */
object VectorFunctions {

  import org.apache.spark.sql.GraftBridge.{column, expression}

  /** array<float> → array<double> (scores are computed in double). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /**
   * Dot product — codegen'd [[DotProduct]] expression (left-to-right fold
   * from 0.0, bit-identical to the interpreted `aggregate(zip_with(...))`
   * form it replaces, ~100× less per-pair overhead in all-pairs scoring).
   */
  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** Squared L2 norm = dot(a, a) (same left-to-right fold). */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity in double. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /**
   * Brute-force cosine top-k against a literal query vector: one
   * codegen'd projection + TakeOrderedAndProject — the exact baseline.
   * Scales as a full scan (no index); at 100 TB this is the verifier for
   * the LSH path below, run on samples.
   */
  def cosineTopK(embeddings: DataFrame, vecCol: String, idCol: String,
                 query: Seq[Double], k: Int): DataFrame = {
    val q = lit(query.toArray)
    val e = toDouble(col(vecCol))
    embeddings
      .select(col(idCol), cosine(e, q).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /**
   * Random-hyperplane LSH bucket id: `planes` pseudo-random ±1
   * hyperplanes, plane i's component j = sign of bit j of FNV-style
   * mix of i — fully deterministic, computable in the engine (no
   * stored plane matrix). Bucket = sign-bit string of the plane dot
   * products.
   *
   * Scale path: group/bucket-join on `bucket` replaces the O(n²) or
   * full-scan search; recall is tuned by `planes` (fewer planes → bigger
   * buckets → higher recall, more compute).
   */
  def lshBucket(vec: Column, dim: Int, planes: Int = 12): Column = {
    val v = toDouble(vec)
    val bits = (0 until planes).map { p =>
      val d = dot(v, planeLiteral(p, dim))
      when(d >= 0, lit(1L)).otherwise(lit(0L)) * lit(1L << p)
    }
    bits.reduce(_ + _)
  }

  /**
   * Deterministic ±1.0 random hyperplane `p` — THE single source of
   * plane values (the engine-side literals, the driver-side query-bucket
   * replication, and the DuckDB oracle literals all call this).
   * Signs come from `Fnv.mixed`, not the raw FNV hash: raw FNV's bit 0
   * is the parity of the key bytes, which made every plane ±the same
   * vector (see Fnv.mixed's doc) — unmixed, LSH had exactly one
   * effective hyperplane.
   */
  def planeArray(p: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { j =>
      val h = Fnv.mixed(s"plane:$p:$j".getBytes("UTF-8"))
      if ((h & 1L) == 1L) 1.0 else -1.0
    }

  /** [[planeArray]] as a literal column (computed at plan time). */
  private def planeLiteral(p: Int, dim: Int): Column = lit(planeArray(p, dim))

  /**
   * nBits-wide sign signature: bit i of word w = sign of the dot with
   * hyperplane 64·w + i, packed into `nBits/64` longs (bit 63
   * contributes Long.MinValue — the signed reinterpretation — so the
   * per-word sum never overflows ANSI arithmetic). The sketch behind
   * [[graft.NorthStar]]'s s06 ANN k-NN join: E[hamming]/nBits estimates
   * the pair's angle/π, so ranking by hamming approximates ranking by
   * cosine, at 8 bytes per 64 planes instead of 8 bytes per dimension.
   */
  def bitSignature(vec: Column, dim: Int, nBits: Int): Column =
    column(BitSignature(expression(toDouble(vec)), dim, nBits))

  /** Hamming distance between two packed signatures (xor + popcount per
    * word — the cheapest pair kernel there is), codegen'd. */
  def hammingSig(a: Column, b: Column): Column =
    column(HammingSig(expression(a), expression(b)))

  /**
   * IVF-style coarse quantization (the other standard ANN scale path,
   * next to LSH): assign each vector to its nearest of `nCentroids`
   * coarse centroids (argmax dot — centroids share a norm), search only
   * the `nProbe` lists nearest to the query. Centroids here are
   * deterministic FNV-derived pseudo-random vectors so the whole
   * operator (and its SQL oracle) is reproducible without stored state;
   * production IVF swaps in k-means-trained centroids loaded as
   * literals/broadcast — the plan shape is identical.
   */
  def centroid(c: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { j =>
      // mixed, not raw: raw FNV's structured high bits left the 16
      // coarse centroids at mean pairwise |cos| 0.70 (some identical);
      // mixed they sit at 0.10 ≈ 1/√dim, i.e. genuinely random
      val h = Fnv.mixed(s"centroid:$c:$j".getBytes("UTF-8"))
      ((h >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }

  /** argmax-dot centroid id (1-based, first max wins — deterministic). */
  def ivfAssign(vec: Column, dim: Int, nCentroids: Int): Column = {
    val v = toDouble(vec)
    val dots = array((0 until nCentroids).map(c => dot(v, lit(centroid(c, dim)))): _*)
    array_position(dots, array_max(dots))
  }

  def cosineTopKIvf(embeddings: DataFrame, vecCol: String, idCol: String,
                    query: Seq[Double], k: Int, dim: Int,
                    nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    // query's nProbe nearest centroid ids (1-based), computed driver-side
    // with the same arithmetic
    val qDots = (0 until nCentroids).map { c =>
      var acc = 0.0
      val ct = centroid(c, dim)
      var i = 0
      while (i < math.min(query.length, dim)) { acc += query(i) * ct(i); i += 1 }
      (acc, c + 1)
    }
    val probes = qDots.sortBy { case (d, id) => (-d, id) }.take(nProbe).map(_._2)
    val q = lit(query.toArray)
    embeddings
      .withColumn("_list", ivfAssign(col(vecCol), dim, nCentroids))
      .filter(col("_list").isin(probes.map(x => x: Any): _*))
      .select(col(idCol), cosine(toDouble(col(vecCol)), q).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /**
   * LSH-bucketed ANN: score only vectors in the query's bucket
   * (plus optional multiprobe neighbors at Hamming distance 1).
   */
  def cosineTopKLsh(embeddings: DataFrame, vecCol: String, idCol: String,
                    query: Seq[Double], k: Int, dim: Int,
                    planes: Int = 12, multiprobe: Boolean = true): DataFrame = {
    val bucketed = embeddings.withColumn("bucket", lshBucket(col(vecCol), dim, planes))
    // query bucket computed with the same deterministic planes, driver-side
    val qBucket = (0 until planes).map { p =>
      val d = query.zip(planeArray(p, dim)).map { case (x, r) => x * r }.sum
      if (d >= 0) 1L << p else 0L
    }.sum
    val probes: Seq[Long] =
      if (multiprobe) qBucket +: (0 until planes).map(p => qBucket ^ (1L << p))
      else Seq(qBucket)
    val q = lit(query.toArray)
    bucketed
      .filter(col("bucket").isin(probes.map(x => x: Any): _*))
      .select(col(idCol), cosine(toDouble(col(vecCol)), q).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /**
   * Product-quantization ADC top-k [Jégou et al. TPAMI'11]: split each
   * vector into `m` subvectors, code each as the argmin-L2 of `seeds.size`
   * sub-centroids, score a query against codes via per-subspace lookup
   * tables (ADC — asymmetric distance: the query stays exact, only the
   * data side is quantized), take the `candidates` best approximate
   * scores, and exactly rerank those by true cosine.
   *
   * Why this is THE memory-bound ANN shape at 100 TB: the scan side of
   * the plan needs only (id, m sub-codes) — m·log2(ksub) bits per vector
   * (here 16 nibbles = 8 bytes against 256 bytes of float32) — and full
   * vectors are fetched by id ONLY for the `candidates` rerank rows, as a
   * broadcast-able join. This function computes codes inline from the
   * vector column (stateless, oracle-replayable); a deployment
   * materializes the codes table once (e05) and scans that instead —
   * identical plan from the LUT projection down.
   *
   * Centroids are data-sampled (caller passes `seeds`, e.g. the `ksub`
   * lowest-id vectors): unlike FNV-pseudo-random centroids they sit in
   * the data's own distribution, which is what makes the quantization
   * cells tight (measured here: recall@10 1.0 at C=192 across all three
   * SFs vs 0.5–0.8 for random centroids). Everything — assignment ties
   * (first minimum), fold order (left-to-right from 0.0), LUT values
   * (computed IN-ENGINE from the same literals) — is pinned so a SQL
   * oracle replays it bit-exactly.
   */
  def pqAdcTopK(embeddings: DataFrame, vecCol: String, idCol: String,
                query: Seq[Double], seeds: Seq[Seq[Double]], k: Int,
                m: Int, candidates: Int): DataFrame = {
    val dim = query.length
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    val e = embeddings.select(col(idCol), toDouble(col(vecCol)).as("v"))
    val adc = (0 until m).map { mi =>
      val sub = slice(col("v"), mi * dsub + 1, dsub)
      val seedSubs = typedLit(seeds.map(sv => sv.slice(mi * dsub, (mi + 1) * dsub)))
      // dists/qdots share e05's exact fold shape (aggregate ∘ zip_with),
      // so the oracle's list_reduce(list_prepend(0.0, …)) twin matches
      val dists = transform(seedSubs, cc =>
        aggregate(zip_with(sub, cc, (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, x) => a + x))
      val qdots = transform(seedSubs, cc =>
        aggregate(zip_with(lit(query.slice(mi * dsub, (mi + 1) * dsub).toArray), cc,
          (x, y) => x * y), lit(0.0), (a, x) => a + x))
      element_at(qdots, array_position(dists, array_min(dists)).cast("int"))
    }.reduce(_ + _)
    // candidate phase moves only (id, adc) through the top-C heap; the
    // rerank fetches vectors by id — at scale a broadcast join of C ids
    // against the vector store, never a second full scan through a sort
    val cand = e.select(col(idCol), adc.as("adc"))
      .orderBy(col("adc").desc, col(idCol))
      .limit(candidates)
      .select(col(idCol))
    e.join(cand, Seq(idCol), "left_semi")
      .select(col(idCol), cosine(col("v"), lit(query.toArray)).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale dry-run (round-5 item 3): materialize a synthetic corpus ~Rx
 * the size of sf0.1 with the SAME statistics — documents drawn from the
 * source corpus's empirical unigram/length distributions with the same
 * planted near-dup rate, embeddings as seeded unit-normalized gaussians
 * (the source profile: isotropic unit vectors) — as a parquet dir with
 * the harness layout, then run the REAL harness queries
 * (d03/d04/d14/d13 dedup tier, s04/s06 k-NN joins) against 1x and Rx
 * and report wall times, plus the LSH candidate count against the
 * banding-math prediction. Results land in SCALE.md.
 *
 * The document corpus keeps the source's ~30-word vocabulary on
 * purpose: growing the doc count under a FIXED vocabulary is the
 * adversarial direction for shingle-based candidate generation (every
 * shingle's document frequency grows with the corpus) — a
 * disjoint-vocabulary replication would flatter the numbers.
 *
 * Generation is driver-side (a few MB) and seeded: run i is identical
 * every time.
 */
object ScaleDryRun {

  private def time[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Rx documents with source-corpus word/length/near-dup statistics. */
  def synthesizeDocs(spark: SparkSession, srcDir: String, factor: Int,
                     plantedDupRate: Double = 0.01): DataFrame = {
    import spark.implicits._
    val src = spark.read.parquet(s"$srcDir/documents.parquet")
      .select(col("text"), col("lang"), col("source")).collect()
    val texts = src.map(_.getString(0))
    val langs = src.map(_.getString(1))
    val sources = src.map(_.getString(2))
    val words = texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
    val lens = texts.map(_.split("\\s+").count(_.nonEmpty))
    val n = texts.length * factor
    val rnd = new scala.util.Random(4242)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String)]
    var id = 0L
    var i = 0
    while (i < n) {
      val len = lens(rnd.nextInt(lens.length))
      val body = Array.fill(len)(words(rnd.nextInt(words.length))).mkString(" ")
      rows += ((id, body, langs(rnd.nextInt(langs.length)),
        sources(rnd.nextInt(sources.length))))
      id += 1
      if (rnd.nextDouble() < plantedDupRate) {
        // planted near-dup: same doc with one word swapped (J well above
        // the 0.8 threshold at these lengths)
        val toks = body.split(" ")
        toks(rnd.nextInt(toks.length)) = words(rnd.nextInt(words.length))
        rows += ((id, toks.mkString(" "), langs(rnd.nextInt(langs.length)),
          sources(rnd.nextInt(sources.length))))
        id += 1
      }
      i += 1
    }
    rows.toSeq.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("int"))
      .repartition(32)
  }

  /** Rx embeddings: seeded unit-normalized gaussians, source labels. */
  def synthesizeEmbeddings(spark: SparkSession, srcDir: String,
                           factor: Int): DataFrame = {
    import spark.implicits._
    val src = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val labels = src.select(col("label")).as[Int].collect()
    val n = labels.length * factor
    val dim = 64
    val rnd = new scala.util.Random(2424)
    val rows = (0 until n).map { i =>
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val nrm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (i.toLong, v.map(_ / nrm), labels(rnd.nextInt(labels.length)))
    }
    rows.toDF("vec_id", "embedding", "label").repartition(32)
  }

  /** Candidate-pair count of the banded LSH join (sum of C(m,2) over
    * (band, bandhash) buckets — what the equi-join materializes before
    * the estimate/verify stages). */
  private def lshCandidates(hs: DataFrame, k: Int, bands: Int): Long = {
    import graft.functions.{TextFunctions => TF}
    hs.select(col("doc_id"),
        posexplode(TF.lshBandHashes(TF.minhashFromHashes(col("hs"), k), k, bands))
          .as(Seq("band", "bh")))
      .groupBy(col("band"), col("bh")).agg(count(lit(1)).as("m"))
      .agg(sum(expr("m * (m - 1) div 2"))).head().getLong(0)
  }

  /** Banding-math prediction: E[candidates] = Σ_pairs P(cand | J(pair)),
    * P = 1-(1-J^r)^bands, estimated from a seeded sample of pairs. */
  private def predictedCandidates(hs: DataFrame, k: Int, bands: Int,
                                  totalPairs: Double): Double = {
    val r = k / bands
    val ic = graft.functions.Hashing.sortedIntersectCount(col("ha"), col("hb"))
    val a = hs.select(col("doc_id").as("ia"), col("hs").as("ha"))
      .orderBy(rand(7)).limit(400)
    val b = hs.select(col("doc_id").as("ib"), col("hs").as("hb"))
      .orderBy(rand(13)).limit(400)
    val mean = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select((ic.cast("double") /
        (size(col("ha")) + size(col("hb")) - ic)).as("j"))
      .select(avg(lit(1.0) - pow(lit(1.0) - pow(col("j"), lit(r.toDouble)),
        lit(bands.toDouble))))
      .head().getDouble(0)
    mean * totalPairs
  }

  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val workDir = if (args.length > 2) args(2) else "/tmp/graft_scale"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // materialize the synthetic harness dir once (seeded — reruns identical)
    val synthDir = s"$workDir/${factor}x"
    synthesizeDocs(spark, srcDir, factor)
      .write.mode("overwrite").parquet(s"$synthDir/documents.parquet")
    synthesizeEmbeddings(spark, srcDir, factor)
      .write.mode("overwrite").parquet(s"$synthDir/embeddings.parquet")

    val ops = Seq("d03_jaccard_pairs", "d04_minhash_lsh",
      "d14_incremental_neardup", "d13_dedup_verdict", "d15_span_dedup",
      "s04_knn_join", "s06_ann_knn_join", "s08_pq_adc_topk",
      "e07_semdedup", "e08_jl_projection", "t23_ngram_novelty",
      "m05_image_phash", "s09_hybrid_rrf")

    println("| corpus | operator | output rows | wall s |")
    println("|---|---|---|---|")
    for ((label, dir) <- Seq(("sf0.1 (1x)", srcDir), (s"${factor}x", synthDir))) {
      for (op <- ops) {
        val (rows, t) = time(SparkEntry.queries(op)(spark, dir).count())
        println(f"| $label | $op | $rows | $t%.1f |")
      }
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val nDocs = docs.count()
      val hs = graft.operators.Dedup
        .shingleHashTable(docs, "doc_id", "text", 3).persist()
      hs.count()
      val (cand, _) = time(lshCandidates(hs, 128, 32))
      val pred = predictedCandidates(hs, 128, 32, nDocs.toDouble * (nDocs - 1) / 2)
      println(s"| $label | LSH candidate pairs (measured vs banding-math) " +
        s"| $cand vs ${pred.toLong} | - |")
      hs.unpersist()
      NorthStar.releaseCaches(spark, dir)
    }
    spark.stop()
  }
}

package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BitSignature, ByteHistogram, DotProduct, FnvChecksum, HammingSig, KmvSketchAgg, MinHashAgg, MinHashMergeAgg, MinHashSignature, NfcNormalize, PpmAHash, PpmDecodeFeatures, PpmEncode, RollingHash, ShingleHashSet, SigMatchCount, SimHash64, SortedLongIntersectCount, WavDecodeFeatures, WavEncode, WavWindowEnergy, WordShingles, ZOrderLong}

/**
 * Catalyst extension wiring (SURVEY.md §7.2): registers graft's custom
 * expressions as SQL functions so the full surface is reachable from
 * `spark.sql(...)` as well as the Column API.
 *
 * Deploy-time use (cluster-wide):
 * {{{
 *   spark.sql.extensions=graft.plans.GraftExtensions
 * }}}
 * Live-session use: [[GraftFunctions.register]].
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ => RowNumberLimitToTopK)
  }
}

object GraftFunctions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.functions", null, name, usage, "", "", "", "", "4.0.0", "", "internal")

  /** (name, info, builder) for every SQL-exposed custom function. */
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("simhash64",
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of an array<string>"),
      (args: Seq[Expression]) => SimHash64(args.head)),
    ("rolling_hash",
      info("rolling_hash", "rolling_hash(tokens) - order-sensitive polynomial fingerprint"),
      (args: Seq[Expression]) => RollingHash(args.head)),
    ("dot_product",
      info("dot_product", "dot_product(a, b) - codegen'd double-array dot product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("fnv_checksum",
      info("fnv_checksum", "fnv_checksum(binary) - FNV-1a-64 checksum"),
      (args: Seq[Expression]) => FnvChecksum(args.head)),
    ("byte_histogram",
      info("byte_histogram", "byte_histogram(binary, dim) - normalized byte histogram"),
      (args: Seq[Expression]) => ByteHistogram(args(0),
        args(1).eval(null).asInstanceOf[Int])),
    ("minhash_agg",
      info("minhash_agg", "minhash_agg(hash, k) - k-wide MinHash sketch aggregate"),
      (args: Seq[Expression]) => MinHashAgg(args(0),
        args(1).eval(null).asInstanceOf[Int]).toAggregateExpression()),
    ("minhash_merge_agg",
      info("minhash_merge_agg", "minhash_merge_agg(sig, k) - element-wise-min merge of k-wide MinHash signatures"),
      (args: Seq[Expression]) => MinHashMergeAgg(args(0),
        args(1).eval(null).asInstanceOf[Int]).toAggregateExpression()),
    ("kmv_sketch_agg",
      info("kmv_sketch_agg", "kmv_sketch_agg(hash, k) - k smallest distinct hashes (bottom-k distinct sketch)"),
      (args: Seq[Expression]) => KmvSketchAgg(args(0),
        args(1).eval(null).asInstanceOf[Int]).toAggregateExpression()),
    ("word_shingles",
      info("word_shingles", "word_shingles(tokens, n) - distinct n-gram shingle strings"),
      (args: Seq[Expression]) => WordShingles(args(0),
        args(1).eval(null).asInstanceOf[Int])),
    ("shingle_hash_set",
      info("shingle_hash_set", "shingle_hash_set(tokens, n) - sorted distinct 64-bit n-gram shingle hashes"),
      (args: Seq[Expression]) => ShingleHashSet(args(0),
        args(1).eval(null).asInstanceOf[Int])),
    ("minhash_signature",
      info("minhash_signature", "minhash_signature(hashes, k) - k-wide MinHash signature of a hash array"),
      (args: Seq[Expression]) => MinHashSignature(args(0),
        args(1).eval(null).asInstanceOf[Int])),
    ("sorted_long_intersect_count",
      info("sorted_long_intersect_count", "sorted_long_intersect_count(a, b) - merge-intersect size of two sorted long arrays"),
      (args: Seq[Expression]) => SortedLongIntersectCount(args(0), args(1))),
    ("sig_match_count",
      info("sig_match_count", "sig_match_count(a, b) - positions where two equal-length signatures agree"),
      (args: Seq[Expression]) => SigMatchCount(args(0), args(1))),
    ("zorder_long",
      info("zorder_long", "zorder_long(a, b, bits) - Morton interleave of two longs' low bits"),
      (args: Seq[Expression]) => ZOrderLong(args(0), args(1),
        args(2).eval(null).asInstanceOf[Int])),
    ("bit_signature",
      info("bit_signature", "bit_signature(vec, dim, nbits) - hyperplane sign sketch packed into nbits/64 longs"),
      // cast to array<double> like the Column API's toDouble does —
      // BitSignature.compute reads 8-byte doubles, so a raw float-array
      // child would produce silent garbage, not an error
      (args: Seq[Expression]) => BitSignature(
        org.apache.spark.sql.catalyst.expressions.Cast(args(0),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)),
        args(1).eval(null).asInstanceOf[Int],
        args(2).eval(null).asInstanceOf[Int])),
    ("hamming_sig",
      info("hamming_sig", "hamming_sig(a, b) - hamming distance of two packed long-array signatures"),
      (args: Seq[Expression]) => HammingSig(args(0), args(1))),
    // encode payload args are cast to BINARY in the builder (like
    // bit_signature's array<double> cast): a raw STRING child would make
    // the generated Java call compute(long, byte[]) with a UTF8String —
    // janino fails, and every row silently falls back to the interpreted
    // projection on the exact 10^9-row stage the codecs exist for
    ("ppm_encode",
      info("ppm_encode", "ppm_encode(doc_id, text) - deterministic binary PPM (P6) rendering"),
      (args: Seq[Expression]) => PpmEncode(args(0),
        org.apache.spark.sql.catalyst.expressions.Cast(args(1),
          org.apache.spark.sql.types.BinaryType))),
    ("ppm_decode_features",
      info("ppm_decode_features", "ppm_decode_features(data) - parse binary PPM: [w, h, meanRGB, lum histogram], NULL if malformed"),
      (args: Seq[Expression]) => PpmDecodeFeatures(args.head)),
    ("wav_encode",
      info("wav_encode", "wav_encode(doc_id, text) - deterministic RIFF/WAVE PCM16 rendering"),
      (args: Seq[Expression]) => WavEncode(args(0),
        org.apache.spark.sql.catalyst.expressions.Cast(args(1),
          org.apache.spark.sql.types.BinaryType))),
    ("wav_decode_features",
      info("wav_decode_features", "wav_decode_features(data) - parse RIFF/WAVE PCM16: [rate, n, peak, zero_crossings, mean_amp, rms], NULL if malformed"),
      (args: Seq[Expression]) => WavDecodeFeatures(args.head)),
    ("ppm_ahash",
      info("ppm_ahash", "ppm_ahash(data) - parse binary PPM and return its 64-bit average perceptual hash, NULL if malformed"),
      (args: Seq[Expression]) => PpmAHash(args.head)),
    ("nfc_normalize",
      info("nfc_normalize", "nfc_normalize(text) - Unicode NFC canonical composition (UAX #15)"),
      (args: Seq[Expression]) => NfcNormalize(args.head)),
    ("wav_window_energy",
      info("wav_window_energy", "wav_window_energy(data, window) - per-full-window sum of |PCM16 amplitude|, NULL if malformed"),
      (args: Seq[Expression]) => WavWindowEnergy(args(0),
        args(1).eval(null).asInstanceOf[Int])))

  /** Register every function on an already-running session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (name, i, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name, i, builder)
    }

  /** Arm the custom planner strategy + optimizer rewrite on a live
    * session (the `spark.sql.extensions` path does this at build time;
    * this is the equivalent for sessions graft didn't construct). */
  def armOptimizer(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    if (!spark.experimental.extraOptimizations.contains(RowNumberLimitToTopK))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RowNumberLimitToTopK
  }
}

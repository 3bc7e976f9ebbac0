package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{PpmAHash, PpmCodec, PpmDecodeFeatures, PpmEncode, WavDecodeFeatures, WavEncode}

/**
 * Multimodal column plumbing (SURVEY.md §7.1 M5): media as opaque
 * `binary` payloads with typed metadata, processed by a partition-wise
 * decode/feature-extract stage.
 *
 * The codec is REAL: binary PPM (P6) with an actual header parser
 * ([[graft.functions.PpmCodec]] — magic, comments, whitespace, maxval,
 * truncation all handled; malformed payloads become NULL rows). The
 * corpus has no binary fixtures, so payloads are rendered
 * deterministically from the documents table by the encoder half
 * ([[graft.functions.PpmEncode]]) and then decoded by the parser half —
 * a genuine encode→parse→extract round trip per row. Production swaps
 * the PPM kernel for JPEG/PNG/wav behind the same two expressions (or
 * the [[decodeFeatures]] mapPartitions shape when the codec needs
 * per-task native-handle init); the pipeline shape does not change:
 * payloads stay distributed, extraction is per-row, no shuffle.
 */
object Multimodal {

  import org.apache.spark.sql.GraftBridge.{column, expression}

  /** Encoder: deterministic PPM payload rendered from (doc_id, text). */
  def ppmEncode(docId: Column, text: Column): Column =
    column(PpmEncode(expression(docId), expression(text.cast(BinaryType))))

  /** Decoder: PPM payload → [w, h, meanRGB, lum-histogram], NULL if
    * malformed. */
  def ppmDecode(data: Column): Column =
    column(PpmDecodeFeatures(expression(data)))

  /** Perceptual hash: PPM payload → 64-bit aHash, NULL if malformed. */
  def ppmAHash(data: Column): Column =
    column(PpmAHash(expression(data)))

  /** docs → media table → per-image perceptual hash. Each row is one
    * decode + 8×8 sample + pack — no shuffle; the downstream image
    * near-dup pair search is d05's byte-banded hamming join applied to
    * the `phash` column unchanged. */
  def phashTable(docs: DataFrame): DataFrame =
    toMediaTable(docs)
      .select(col("doc_id"), ppmAHash(col("data")).as("phash"))

  /** A media payload row: opaque bytes + typed metadata. */
  case class MediaRecord(
      doc_id: Long,
      data: Array[Byte],
      mime: String,
      n_bytes: Long)

  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      checksum: Long,
      feature: Array[Double])

  /** documents(text) → binary media table: each doc rendered as a real
    * PPM image payload with typed metadata. */
  def toMediaTable(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        ppmEncode(col("doc_id"), col("text")).as("data"))
      .select(
        col("doc_id"),
        col("data"),
        lit("image/x-portable-pixmap").as("mime"),
        length(col("data")).cast(LongType).as("n_bytes"))

  /**
   * Partition-wise decode: one codec per partition, rows streamed —
   * the Scala analogue of a Pandas-UDF `mapInPandas` decode stage. Kept
   * as the integration shape for codecs that need per-task init (native
   * lib handle); must agree row-for-row with [[decodePipeline]]'s
   * expression path (A/B-tested). Malformed payloads are dropped here
   * (the expression path NULLs them — flatMap is the Dataset twin).
   */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { rows =>
      // per-task codec init would go here (e.g. native lib handle)
      rows.flatMap { r =>
        PpmCodec.decode(r.data).map { img =>
          MediaFeatures(r.doc_id, r.n_bytes,
            graft.functions.Fnv.hashBytes(r.data), PpmCodec.features(img))
        }
      }
    }
  }

  /**
   * End-to-end: docs → PPM media table → parsed/decoded features, all as
   * codegen'd Catalyst expressions — no Dataset-encoder round-trip.
   * The feature vector is projected ONCE into an intermediate column and
   * the scalar outputs are element_at over it (single parse per row, not
   * one parse per output column). Columns: payload metadata + checksum,
   * parsed width/height, exact channel means, 8-bin luminance histogram.
   */
  def decodePipeline(docs: DataFrame): DataFrame = {
    import graft.functions.Hashing
    val media = toMediaTable(docs)
    val f = col("_f")
    media.select(
      col("doc_id"), col("n_bytes"),
      Hashing.fnvChecksum(col("data")).as("checksum"),
      ppmDecode(col("data")).as("_f"))
      .select(Seq(
        col("doc_id"), col("n_bytes"), col("checksum"),
        element_at(f, 1).cast(IntegerType).as("width"),
        element_at(f, 2).cast(IntegerType).as("height"),
        element_at(f, 3).as("mean_r"),
        element_at(f, 4).as("mean_g"),
        element_at(f, 5).as("mean_b")) ++
        (0 until 8).map(b => element_at(f, 6 + b).as(s"h$b")): _*)
  }

  /** Encoder: deterministic RIFF/WAVE PCM16 payload from (doc_id, text). */
  def wavEncode(docId: Column, text: Column): Column =
    column(WavEncode(expression(docId), expression(text.cast(BinaryType))))

  /** Decoder: WAV payload → [rate, n, peak, zc, mean_amp, rms], NULL if
    * malformed. */
  def wavDecode(data: Column): Column =
    column(WavDecodeFeatures(expression(data)))

  /** Per-full-window sum of absolute PCM16 amplitudes (exact longs),
    * NULL if malformed — the m08 segmentation primitive. */
  def wavWindowEnergy(data: Column, window: Int): Column =
    column(graft.functions.WavWindowEnergy(expression(data), window))

  /**
   * 63-bit energy-delta-sign audio fingerprint over a per-sample
   * |amplitude| array (`wavWindowEnergy(_, 1)`): bit b (0..62) is set
   * iff |s[b+1]| > |s[b]| over the first 64 samples — the
   * Haitsma–Kalker (Philips robust hash, 2002) fingerprint shape on the
   * amplitude envelope. Delta-SIGN quantization makes it invariant to
   * uniform gain; bit 63 is never set, so the value is non-negative and
   * a SQL replay needs no signed-bit special case. The 63 shift
   * constants are Scala-side literals — one flat integer projection,
   * whole-stage-codegen'd, no higher-order functions. Out-of-range
   * reads go through `try_element_at` (NULL, not an ANSI error), so an
   * array shorter than 64 entries yields 0 bits past its end — the
   * same truncation DuckDB's out-of-range list index replays; the
   * harness generator always supplies ≥ 64 samples.
   */
  def audioFingerprint(amps: Column): Column =
    (0 to 62).map { b =>
      when(try_element_at(amps, lit(b + 2)) > try_element_at(amps, lit(b + 1)),
          lit(1L << b))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /**
   * The audio twin of [[decodePipeline]]: docs → WAV media table →
   * parsed PCM features, all per-row codegen'd expressions (encode,
   * RIFF chunk-walk parse, integer-accumulator features — no shuffle).
   * Columns: payload metadata + checksum, parsed rate and sample count,
   * peak amplitude, zero crossings, mean |amplitude|, RMS.
   */
  def wavPipeline(docs: DataFrame): DataFrame = {
    import graft.functions.Hashing
    val f = col("_f")
    docs
      .select(col("doc_id"), wavEncode(col("doc_id"), col("text")).as("data"))
      .select(col("doc_id"), col("data"),
        length(col("data")).cast(LongType).as("n_bytes"))
      .select(
        col("doc_id"), col("n_bytes"),
        Hashing.fnvChecksum(col("data")).as("checksum"),
        wavDecode(col("data")).as("_f"))
      .select(
        col("doc_id"), col("n_bytes"), col("checksum"),
        element_at(f, 1).cast(IntegerType).as("sample_rate"),
        element_at(f, 2).cast(IntegerType).as("n_samples"),
        element_at(f, 3).cast(LongType).as("peak_amp"),
        element_at(f, 4).cast(LongType).as("zero_crossings"),
        element_at(f, 5).as("mean_amp"),
        element_at(f, 6).as("rms"))
  }
}

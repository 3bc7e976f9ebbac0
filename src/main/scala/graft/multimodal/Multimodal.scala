package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing (SURVEY.md §7.1 M5): media as opaque
 * `binary` payloads with typed metadata, processed by a partition-wise
 * decode/feature-extract stage.
 *
 * The actual codec step is STUBBED (this container has no image/audio
 * libraries): [[FakeCodec]] is a deterministic stand-in that "decodes" a
 * payload to a fixed-length feature vector. Everything around it — the
 * payload schema, the `mapPartitions` batch shape (one codec instance per
 * partition, streamed rows, no driver materialization), the partitioning
 * contract — is real and is what matters at 100 TB: payloads stay
 * distributed, the codec is initialized once per task, and feature
 * extraction is embarrassingly parallel.
 */
object Multimodal {

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

  /**
   * Deterministic fake codec: replace with a real decoder (JPEG/PNG/wav)
   * by swapping this object — the pipeline shape does not change. Its
   * "feature vector" is an 8-bin byte histogram, normalized: cheap,
   * deterministic, and shaped like a real embedding output.
   */
  object FakeCodec {
    val dim = 8
    def decode(data: Array[Byte]): Array[Double] = {
      val hist = new Array[Double](dim)
      var i = 0
      while (i < data.length) {
        hist((data(i) & 0xff) % dim) += 1.0
        i += 1
      }
      val n = math.max(data.length, 1).toDouble
      var b = 0
      while (b < dim) { hist(b) /= n; b += 1 }
      hist
    }
    def checksum(data: Array[Byte]): Long =
      graft.functions.Fnv.hashBytes(data)
  }

  /** documents(text) → binary payload table with metadata. */
  def toMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast(BinaryType).as("data"),
      lit("text/plain").as("mime"),
      length(col("text").cast(BinaryType)).cast(LongType).as("n_bytes"))

  /**
   * Partition-wise decode: one codec per partition, rows streamed —
   * the Scala analogue of a Pandas-UDF `mapInPandas` decode stage.
   */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { rows =>
      // per-task codec init would go here (e.g. native lib handle)
      rows.map { r =>
        MediaFeatures(r.doc_id, r.n_bytes, FakeCodec.checksum(r.data),
          FakeCodec.decode(r.data))
      }
    }
  }

  /**
   * End-to-end: docs → media table → decoded features. The deterministic
   * FakeCodec math runs as Catalyst expressions
   * ([[graft.functions.FnvChecksum]] / [[graft.functions.ByteHistogram]])
   * directly over the binary column — no Dataset-encoder round-trip, rows
   * never deserialize to case classes. [[decodeFeatures]] remains as the
   * `mapPartitions` shape a REAL native codec (per-task handle init)
   * would need; use it only when an expression can't host the codec.
   * Feature bins are flattened to scalar columns (h0..h7) so the result
   * is oracle-comparable.
   */
  def decodePipeline(docs: DataFrame): DataFrame = {
    import graft.functions.Hashing
    val media = toMediaTable(docs)
    // the histogram is projected ONCE into an intermediate column and the
    // bins are element_at over it — guaranteeing a single pass over the
    // payload bytes rather than trusting subexpression elimination to
    // dedupe dim copies of the expression
    val bins = (0 until FakeCodec.dim).map(b =>
      element_at(col("_hist"), b + 1).as(s"h$b"))
    media.select(
      col("doc_id"), col("n_bytes"),
      Hashing.fnvChecksum(col("data")).as("checksum"),
      Hashing.byteHistogram(col("data"), FakeCodec.dim).as("_hist"))
      .select(Seq(col("doc_id"), col("n_bytes"), col("checksum")) ++ bins: _*)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/**
 * A real (toy-format) AUDIO codec for the multimodal tier: RIFF/WAVE
 * PCM16 mono — the image codec's ([[PpmCodec]]) audio sibling, so the
 * multimodal surface covers a second modality with a genuinely parsed
 * container, not a stub. The parser does the real RIFF work: magic +
 * form-type validation, little-endian field decoding, CHUNK WALKING with
 * the odd-size pad rule (RIFF chunks are word-aligned; a parser that
 * forgets the pad byte desyncs on any odd-sized chunk), unknown chunks
 * skipped, `fmt ` contract checks (PCM, mono, 16-bit), truncation and
 * bounds guards. Malformed payloads yield NULL rows, never exceptions
 * (one corrupt blob must not kill a 10⁹-row decode stage).
 */
object WavCodec {

  /** Hard ceiling on parsed sample count: a corrupt data-chunk size must
    * not make the decoder allocate unbounded memory. */
  final val MaxSamples = 1 << 22

  final case class Audio(sampleRate: Int, samples: Array[Short])

  private def le16(out: Array[Byte], pos: Int, v: Int): Unit = {
    out(pos) = (v & 0xff).toByte
    out(pos + 1) = ((v >>> 8) & 0xff).toByte
  }

  private def le32(out: Array[Byte], pos: Int, v: Int): Unit = {
    out(pos) = (v & 0xff).toByte
    out(pos + 1) = ((v >>> 8) & 0xff).toByte
    out(pos + 2) = ((v >>> 16) & 0xff).toByte
    out(pos + 3) = ((v >>> 24) & 0xff).toByte
  }

  /** Serialize PCM16 mono samples as a canonical 44-byte-header WAV. */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    le32(out, 4, 36 + dataLen)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    le32(out, 16, 16) // fmt chunk size
    le16(out, 20, 1) // PCM
    le16(out, 22, 1) // mono
    le32(out, 24, sampleRate)
    le32(out, 28, sampleRate * 2) // byte rate
    le16(out, 32, 2) // block align
    le16(out, 34, 16) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    le32(out, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      le16(out, 44 + 2 * i, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  private def rdLe16(d: Array[Byte], p: Int): Int =
    (d(p) & 0xff) | ((d(p + 1) & 0xff) << 8)

  private def rdLe32(d: Array[Byte], p: Int): Long =
    (d(p) & 0xffL) | ((d(p + 1) & 0xffL) << 8) |
      ((d(p + 2) & 0xffL) << 16) | ((d(p + 3) & 0xffL) << 24)

  private def tag(d: Array[Byte], p: Int): String =
    new String(d, p, 4, "US-ASCII")

  /** Parse a RIFF/WAVE payload; None on any malformation (bad magic or
    * form type, non-PCM/non-mono/non-16-bit fmt, missing fmt before
    * data, truncated chunk, oversized data, zero samples). Unknown
    * chunks are skipped with the RIFF even-byte pad rule. */
  def decode(data: Array[Byte]): Option[Audio] = {
    if (data.length < 12 || tag(data, 0) != "RIFF" || tag(data, 8) != "WAVE")
      return None
    var pos = 12
    var sampleRate = -1
    while (pos + 8 <= data.length) {
      val id = tag(data, pos)
      val size = rdLe32(data, pos + 4)
      val body = pos + 8
      if (size < 0 || size > data.length - body) return None
      if (id == "fmt ") {
        if (size < 16) return None
        val fmt = rdLe16(data, body)
        val channels = rdLe16(data, body + 2)
        val bits = rdLe16(data, body + 14)
        if (fmt != 1 || channels != 1 || bits != 16) return None
        sampleRate = rdLe32(data, body + 4).toInt
        if (sampleRate <= 0) return None
      } else if (id == "data") {
        if (sampleRate < 0) return None // fmt must precede data
        val n = (size / 2).toInt
        if (n < 1 || n > MaxSamples || size % 2 != 0) return None
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) { samples(i) = rdLe16(data, body + 2 * i).toShort; i += 1 }
        return Some(Audio(sampleRate, samples))
      }
      // advance with the RIFF pad: odd-sized chunks carry one pad byte
      pos = body + size.toInt + (size % 2).toInt
    }
    None
  }

  final val FeatureLen = 6

  /** Decoded features: [sample_rate, n_samples, peak, zero_crossings,
    * mean_amp, rms] — integer accumulators with one final divide (and
    * one sqrt for rms; sqrt and divide are cross-libm bit-stable, unlike
    * ln), so every value is reproducible in SQL. Zero-crossing sign
    * convention: sign(s) = s >= 0, a crossing is a flip between
    * consecutive samples. */
  def features(a: Audio): Array[Double] = {
    val n = a.samples.length
    var sumAbs = 0L
    var sumSq = 0L
    var peak = 0L
    var zc = 0L
    var i = 0
    while (i < n) {
      val s = a.samples(i).toLong
      val abs = math.abs(s)
      sumAbs += abs
      sumSq += s * s
      if (abs > peak) peak = abs
      if (i > 0 && ((s >= 0) != (a.samples(i - 1) >= 0))) zc += 1
      i += 1
    }
    Array(a.sampleRate.toDouble, n.toDouble, peak.toDouble, zc.toDouble,
      sumAbs.toDouble / n, math.sqrt(sumSq.toDouble / n))
  }
}

/**
 * Deterministic WAV rendering of a document — the ENCODER half of the
 * m04 round trip (the corpus ships no audio fixtures, so payloads are
 * rendered from the documents table and then genuinely re-parsed).
 * n = 64 + id mod 193 samples at rate 8000 + (id mod 3)·4000 Hz;
 * pre-sign sample i is (textByte[i mod len]·129 + (i mod 251)) mod 2¹⁶
 * — varying rates and lengths so the parser sees non-constant headers.
 */
case class WavEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_encode"

  def compute(docId: Long, text: Array[Byte]): Array[Byte] = {
    val n = (64 + math.floorMod(docId, 193L)).toInt
    val rate = (8000 + math.floorMod(docId, 3L) * 4000).toInt
    val len = math.max(text.length, 1)
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      val b = if (text.length == 0) 0 else text(i % len) & 0xff
      samples(i) = ((b * 129 + i % 251) % 65536).toShort
      i += 1
    }
    WavCodec.encode(rate, samples)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(MediaEncodeInputs.docId(a), MediaEncodeInputs.bytes(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wavEncExpr", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WavEncode =
    copy(left = newLeft, right = newRight)
}

/**
 * The DECODER half: parse a RIFF/WAVE payload with [[WavCodec.decode]]
 * and emit the feature vector, or NULL if the payload is malformed.
 */
case class WavDecodeFeatures(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "wav_decode_features"
  override def nullable: Boolean = true

  def compute(data: Array[Byte]): GenericArrayData =
    WavCodec.decode(data) match {
      case Some(a) => new GenericArrayData(WavCodec.features(a))
      case None => null
    }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wavDecExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = $ref.compute($c);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): WavDecodeFeatures =
    copy(child = newChild)
}

/**
 * Per-window energy profile of a RIFF/WAVE payload: the sum of absolute
 * PCM16 amplitudes over each FULL `window`-sample window (tail samples
 * past the last full window are dropped), or NULL if the payload is
 * malformed. Pure 64-bit integer accumulation — window ≤ 2²² samples of
 * magnitude ≤ 2¹⁵ cannot overflow a long — so the profile is an exact,
 * engine-independent function of the payload bytes: the primitive under
 * m08's energy-threshold segmentation (VAD shape), where all
 * thresholding happens in integer arithmetic on these sums.
 */
case class WavWindowEnergy(child: Expression, window: Int)
    extends UnaryExpression {
  require(window >= 1, s"window must be >= 1, got $window")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "wav_window_energy"
  override def nullable: Boolean = true

  def compute(data: Array[Byte]): GenericArrayData =
    WavCodec.decode(data) match {
      case Some(a) =>
        val nWin = a.samples.length / window
        val out = new Array[Long](nWin)
        var w = 0
        while (w < nWin) {
          var acc = 0L
          var i = w * window
          val end = i + window
          while (i < end) { acc += math.abs(a.samples(i).toLong); i += 1 }
          out(w) = acc
          w += 1
        }
        new GenericArrayData(out)
      case None => null
    }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wavEnergyExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = $ref.compute($c);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): WavWindowEnergy =
    copy(child = newChild)
}

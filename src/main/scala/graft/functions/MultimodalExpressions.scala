package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType}

/**
 * A real (toy-format) image codec for the multimodal tier: binary PPM
 * (P6) — the simplest actual image format with a parsed header
 * (`P6 <whitespace/comments> width height maxval <single ws> raw RGB`).
 * Chosen because it needs no native library, so the decode path can be
 * genuinely exercised end-to-end in this container: the parser handles
 * magic validation, `#` comments, arbitrary whitespace, maxval checks
 * and payload truncation — the real failure modes of a real decoder —
 * and malformed payloads yield NULL rows, not exceptions (the 100 TB
 * contract: one corrupt blob must not kill a 10⁹-row decode stage).
 */
object PpmCodec {

  /** Hard ceiling on parsed dimensions: a corrupt header must not make
    * the decoder allocate unbounded memory. */
  final val MaxDim = 4096

  final case class Image(width: Int, height: Int, pixels: Array[Byte])

  /** Serialize RGB pixels as binary PPM (P6, maxval 255). */
  def encode(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height * 3, "pixel buffer size mismatch")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(pixels, 0, out, header.length, pixels.length)
    out
  }

  /** Parse a binary PPM; None on any malformation (wrong magic, comment
    * -only/truncated header, non-255 maxval, oversized dims, short
    * pixel payload). */
  def decode(data: Array[Byte]): Option[Image] = {
    var pos = 0
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && pos < data.length) {
        val c = data(pos)
        if (c == '#') { // comment runs to end of line
          while (pos < data.length && data(pos) != '\n') pos += 1
        } else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') pos += 1
        else go = false
      }
    }
    def readInt(): Option[Int] = {
      skipWsAndComments()
      var v = 0L
      var any = false
      while (pos < data.length && data(pos) >= '0' && data(pos) <= '9') {
        v = v * 10 + (data(pos) - '0')
        if (v > Int.MaxValue) return None
        any = true
        pos += 1
      }
      if (any) Some(v.toInt) else None
    }
    if (data.length < 2 || data(0) != 'P' || data(1) != '6') return None
    pos = 2
    for {
      w <- readInt()
      h <- readInt()
      maxval <- readInt()
      if w > 0 && h > 0 && w <= MaxDim && h <= MaxDim && maxval == 255
      // exactly ONE whitespace byte separates maxval from the raster
      if pos < data.length && (data(pos) == '\n' || data(pos) == ' ' ||
        data(pos) == '\t' || data(pos) == '\r')
      px = {
        pos += 1
        val need = w * h * 3
        if (data.length - pos >= need)
          Some(java.util.Arrays.copyOfRange(data, pos, pos + need))
        else None
      }
      p <- px
    } yield Image(w, h, p)
  }

  final val FeatureLen = 13

  /**
   * 64-bit average perceptual hash (aHash): luminance sampled on a fixed
   * 8×8 grid (sample (i,j) reads pixel (⌊i·h/8⌋, ⌊j·w/8⌋) — a nearest-
   * neighbor downscale, so the hash is resolution-tolerant), bit k set
   * iff sample k is ≥ the grid mean. The mean compare is the integer
   * inequality `lum·64 ≥ Σlum` — no division, so the bit pattern is
   * replayable exactly in SQL. Near-duplicate IMAGES then reduce to
   * small-hamming 64-bit pairs, i.e. exactly the shape d05's byte-banded
   * SimHash pair search already handles at scale.
   */
  def aHash(img: Image): Long = {
    val w = img.width; val h = img.height
    val s = new Array[Long](64)
    var sum = 0L
    var k = 0
    while (k < 64) {
      val p = ((k / 8) * h / 8) * w + (k % 8) * w / 8
      val lum = ((img.pixels(3 * p) & 0xff) + (img.pixels(3 * p + 1) & 0xff)
        + (img.pixels(3 * p + 2) & 0xff)) / 3
      s(k) = lum; sum += lum; k += 1
    }
    var acc = 0L
    k = 0
    while (k < 64) { if (s(k) * 64 >= sum) acc |= (1L << k); k += 1 }
    acc
  }

  /** Decoded features: [width, height, meanR, meanG, meanB, lum0..lum7]
    * — channel means are exact integer sums with ONE final divide, and
    * the luminance histogram bins (r+g+b)/3 by 32s, normalized by the
    * pixel count: every value is reproducible bit-for-bit in SQL. */
  def features(img: Image): Array[Double] = {
    val n = img.width * img.height
    var sr = 0L; var sg = 0L; var sb = 0L
    val hist = new Array[Long](8)
    var k = 0
    while (k < n) {
      val r = img.pixels(3 * k) & 0xff
      val g = img.pixels(3 * k + 1) & 0xff
      val b = img.pixels(3 * k + 2) & 0xff
      sr += r; sg += g; sb += b
      hist(((r + g + b) / 3) / 32) += 1L
      k += 1
    }
    val out = new Array[Double](FeatureLen)
    out(0) = img.width.toDouble
    out(1) = img.height.toDouble
    out(2) = sr.toDouble / n
    out(3) = sg.toDouble / n
    out(4) = sb.toDouble / n
    var b2 = 0
    while (b2 < 8) { out(5 + b2) = hist(b2).toDouble / n; b2 += 1 }
    out
  }
}

/**
 * Shared interpreted-path input coercion for the media ENCODE
 * expressions ([[PpmEncode]], [[WavEncode]]): the codegen path gets
 * Java's implicit int→long widening and a BINARY child for free, but
 * the interpreted path (e.g. ConstantFolding of an INT doc_id literal,
 * or a STRING payload that escaped the builder cast) sees the raw
 * boxed values — both encoders must accept exactly the same ones, so
 * the adapter lives in ONE place.
 */
private[functions] object MediaEncodeInputs {
  def docId(a: Any): Long = a.asInstanceOf[Number].longValue()
  def bytes(b: Any): Array[Byte] = b match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.getBytes
    case raw => raw.asInstanceOf[Array[Byte]]
  }
}

/**
 * Deterministic PPM rendering of a document: dims derive from doc_id
 * (w = 8 + id mod 9, h = 8 + id mod 7 — varying, so the decoder's
 * header parse is exercised on non-constant headers), pixel byte i is
 * text byte i mod len. This is the ENCODER half of the m02 round trip;
 * it exists so the corpus has real image payloads to decode without
 * shipping binary fixtures.
 */
case class PpmEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "ppm_encode"

  def compute(docId: Long, text: Array[Byte]): Array[Byte] = {
    val w = (8 + math.floorMod(docId, 9L)).toInt
    val h = (8 + math.floorMod(docId, 7L)).toInt
    val n = math.max(text.length, 1)
    val px = new Array[Byte](w * h * 3)
    var i = 0
    while (i < px.length) {
      px(i) = if (text.length == 0) 0 else text(i % n)
      i += 1
    }
    PpmCodec.encode(w, h, px)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(MediaEncodeInputs.docId(a), MediaEncodeInputs.bytes(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ppmEncExpr", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PpmEncode =
    copy(left = newLeft, right = newRight)
}

/**
 * The DECODER half: parse a binary PPM payload with [[PpmCodec.decode]]
 * and emit the feature vector, or NULL if the payload is malformed.
 * Codegen'd via the captured-reference pattern; the whole parse +
 * feature pass is one primitive loop per row.
 */
case class PpmDecodeFeatures(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "ppm_decode_features"
  override def nullable: Boolean = true

  def compute(data: Array[Byte]): GenericArrayData =
    PpmCodec.decode(data) match {
      case Some(img) => new GenericArrayData(PpmCodec.features(img))
      case None => null
    }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ppmDecExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = $ref.compute($c);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PpmDecodeFeatures =
    copy(child = newChild)
}

/**
 * Perceptual-hash decode: PPM payload → 64-bit aHash ([[PpmCodec.aHash]]),
 * NULL if the payload is malformed. Same captured-reference codegen as
 * [[PpmDecodeFeatures]]; parse + sample + pack is one primitive pass.
 */
case class PpmAHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "ppm_ahash"
  override def nullable: Boolean = true

  def compute(data: Array[Byte]): java.lang.Long =
    PpmCodec.decode(data) match {
      case Some(img) => java.lang.Long.valueOf(PpmCodec.aHash(img))
      case None => null
    }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ppmAHashExpr", this)
    val boxed = ctx.freshName("boxed")
    nullSafeCodeGen(ctx, ev, c => s"""
       |java.lang.Long $boxed = $ref.compute($c);
       |${ev.isNull} = ($boxed == null);
       |${ev.value} = ${ev.isNull} ? -1L : $boxed.longValue();
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PpmAHash =
    copy(child = newChild)
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{Fnv, PpmCodec, WavCodec}
import graft.multimodal.Multimodal

/** Multimodal decode plumbing: a REAL (toy-format) codec — binary PPM
  * with an actual header parser. The encode→parse→extract round trip,
  * the parser's malformation handling, and the agreement between the
  * expression path and the mapPartitions path are all asserted. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world"),
    (2L, "a slightly longer payload 12345"),
    (3L, "x")).toDF("doc_id", "text")

  test("PpmCodec round trip: decode(encode(img)) recovers dims and pixels") {
    val px = Array.tabulate(6 * 4 * 3)(i => ((i * 37) % 256).toByte)
    val img = PpmCodec.decode(PpmCodec.encode(6, 4, px))
    assert(img.isDefined)
    assert(img.get.width == 6 && img.get.height == 4)
    assert(img.get.pixels.toSeq == px.toSeq)
  }

  test("PpmCodec parser: comments and arbitrary whitespace in the header") {
    val px = Array.tabulate(2 * 2 * 3)(_.toByte)
    val bytes = ("P6 # a comment\n# another full-line comment\n  2\t2 " +
      "# trailing\n255\n").getBytes("US-ASCII") ++ px
    val img = PpmCodec.decode(bytes)
    assert(img.isDefined && img.get.width == 2 && img.get.height == 2)
    assert(img.get.pixels.toSeq == px.toSeq)
  }

  test("PpmCodec parser: every malformation yields None, not an exception") {
    val good = PpmCodec.encode(2, 2, Array.fill(12)(7.toByte))
    assert(PpmCodec.decode(good).isDefined)
    // wrong magic (P5 is greyscale PGM)
    assert(PpmCodec.decode("P5\n2 2\n255\n".getBytes ++ Array.fill(12)(7.toByte)).isEmpty)
    // truncated raster
    assert(PpmCodec.decode(good.dropRight(1)).isEmpty)
    // 16-bit maxval (valid PPM, unsupported depth — must refuse, not misparse)
    assert(PpmCodec.decode("P6\n2 2\n65535\n".getBytes ++ Array.fill(24)(7.toByte)).isEmpty)
    // zero / oversized dims
    assert(PpmCodec.decode("P6\n0 2\n255\n".getBytes).isEmpty)
    assert(PpmCodec.decode(s"P6\n99999 2\n255\n".getBytes).isEmpty)
    // header runs off the end
    assert(PpmCodec.decode("P6\n2".getBytes).isEmpty)
    assert(PpmCodec.decode(Array[Byte]()).isEmpty)
  }

  test("decodePipeline: real parse of the rendered payload, exact features") {
    val rows = Multimodal.decodePipeline(docs).orderBy(col("doc_id")).collect()
    val texts = Map(1L -> "hello world", 2L -> "a slightly longer payload 12345",
      3L -> "x")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val t = texts(id).getBytes("US-ASCII")
      val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
      val px = Array.tabulate(w * h * 3)(i => t(i % t.length))
      val payload = PpmCodec.encode(w, h, px)
      assert(r.getAs[Long]("n_bytes") == payload.length)
      assert(r.getAs[Long]("checksum") == Fnv.hashBytes(payload))
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      val exp = PpmCodec.features(PpmCodec.Image(w, h, px))
      assert(r.getAs[Double]("mean_r") == exp(2))
      assert(r.getAs[Double]("mean_g") == exp(3))
      assert(r.getAs[Double]("mean_b") == exp(4))
      (0 until 8).foreach(b => assert(r.getAs[Double](s"h$b") == exp(5 + b)))
      assert(math.abs((0 until 8).map(b => r.getAs[Double](s"h$b")).sum - 1.0) < 1e-12)
    }
  }

  test("mapPartitions codec path (native-handle shape) agrees with the " +
       "expression path row-for-row") {
    val viaDs = Multimodal.decodeFeatures(Multimodal.toMediaTable(docs))
      .collect().map(f => (f.doc_id, f.checksum, f.feature.toSeq)).sortBy(_._1)
    val viaExpr = Multimodal.decodePipeline(docs).orderBy(col("doc_id")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("checksum"),
        Seq(r.getAs[Int]("width").toDouble, r.getAs[Int]("height").toDouble,
          r.getAs[Double]("mean_r"), r.getAs[Double]("mean_g"),
          r.getAs[Double]("mean_b")) ++
          (0 until 8).map(b => r.getAs[Double](s"h$b"))))
    assert(viaDs.length == viaExpr.length)
    viaDs.zip(viaExpr).foreach { case ((id1, c1, f1), (id2, c2, f2)) =>
      assert(id1 == id2 && c1 == c2 && f1 == f2)
    }
  }

  test("toMediaTable: real PPM payload with typed metadata") {
    val m = Multimodal.toMediaTable(docs).orderBy(col("doc_id")).collect().head
    val data = m.getAs[Array[Byte]]("data")
    assert(new String(data.take(2), "US-ASCII") == "P6")
    assert(m.getAs[String]("mime") == "image/x-portable-pixmap")
    assert(m.getAs[Long]("n_bytes") == data.length.toLong)
    // dims for doc_id 1: w = 8 + 1%9 = 9, h = 8 + 1%7 = 9
    val img = PpmCodec.decode(data)
    assert(img.isDefined && img.get.width == 9 && img.get.height == 9)
  }

  test("a corrupt payload in a decode batch becomes a NULL row (expression) " +
       "and is dropped (mapPartitions) — neither kills the stage") {
    val media = Multimodal.toMediaTable(docs)
      .unionByName(Seq((99L, Array[Byte](80, 54, 10, 120), "image/x-portable-pixmap", 4L))
        .toDF("doc_id", "data", "mime", "n_bytes"))
    val viaExpr = media.select(col("doc_id"),
      Multimodal.ppmDecode(col("data")).as("f"))
    assert(viaExpr.filter(col("f").isNull).select(col("doc_id"))
      .as[Long].collect().toSeq == Seq(99L))
    assert(Multimodal.decodeFeatures(media).collect().map(_.doc_id).sorted
      .toSeq == Seq(1L, 2L, 3L))
  }

  // ---- WAV (m04): the audio modality -------------------------------

  test("WavCodec round trip: decode(encode(audio)) recovers rate and samples") {
    val samples = Array.tabulate(200)(i => ((i * 1103) % 65536 - 32768).toShort)
    val a = WavCodec.decode(WavCodec.encode(16000, samples))
    assert(a.isDefined)
    assert(a.get.sampleRate == 16000)
    assert(a.get.samples.toSeq == samples.toSeq)
  }

  test("WavCodec parser: unknown chunks are skipped with the RIFF pad rule") {
    val samples = Array.tabulate(10)(i => (i * 100).toShort)
    val good = WavCodec.encode(8000, samples)
    // splice an odd-sized LIST chunk (5 bytes + 1 pad) between fmt and data
    val fmtEnd = 36 // canonical header: fmt chunk ends at byte 36
    val oddChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5) ++ Array[Byte](0)
    val spliced = good.take(fmtEnd) ++ oddChunk ++ good.drop(fmtEnd)
    // fix the RIFF size field (bytes 4..7) for the extra 14 bytes
    val riffSize = 36 + samples.length * 2 + oddChunk.length
    for (i <- 0 until 4) spliced(4 + i) = ((riffSize >>> (8 * i)) & 0xff).toByte
    val a = WavCodec.decode(spliced)
    assert(a.isDefined, "pad rule broken: parser desynced on the odd chunk")
    assert(a.get.samples.toSeq == samples.toSeq)
  }

  test("WavCodec parser: every malformation yields None, not an exception") {
    val good = WavCodec.encode(8000, Array.tabulate(10)(i => i.toShort))
    assert(WavCodec.decode(good).isDefined)
    // bad magic and bad form type
    assert(WavCodec.decode("RIFX".getBytes ++ good.drop(4)).isEmpty)
    val badForm = good.clone(); badForm(8) = 'X'.toByte
    assert(WavCodec.decode(badForm).isEmpty)
    // truncated data chunk
    assert(WavCodec.decode(good.dropRight(1)).isEmpty)
    // stereo (channels=2) must refuse, not misparse interleaved samples
    val stereo = good.clone(); stereo(22) = 2
    assert(WavCodec.decode(stereo).isEmpty)
    // non-PCM format code
    val float32 = good.clone(); float32(20) = 3
    assert(WavCodec.decode(float32).isEmpty)
    // 8-bit samples
    val bits8 = good.clone(); bits8(34) = 8
    assert(WavCodec.decode(bits8).isEmpty)
    // data chunk before any fmt chunk
    assert(WavCodec.decode(good.take(12) ++ good.drop(36)).isEmpty)
    // empty / header-only
    assert(WavCodec.decode(Array[Byte]()).isEmpty)
    assert(WavCodec.decode(good.take(12)).isEmpty)
  }

  test("wavPipeline: real parse of the rendered payload, exact features") {
    val rows = Multimodal.wavPipeline(docs).orderBy(col("doc_id")).collect()
    val texts = Map(1L -> "hello world", 2L -> "a slightly longer payload 12345",
      3L -> "x")
    rows.foreach { r =>
      val id = r.getLong(0)
      val n = (64 + id % 193).toInt
      val text = texts(id).getBytes("US-ASCII")
      val samples = Array.tabulate(n) { i =>
        (((text(i % text.length) & 0xff) * 129 + i % 251) % 65536).toShort
      }
      assert(r.getLong(1) == 44 + 2L * n) // n_bytes
      assert(r.getInt(3) == 8000 + (id % 3) * 4000) // sample_rate
      assert(r.getInt(4) == n) // n_samples
      assert(r.getLong(5) == samples.map(s => math.abs(s.toLong)).max) // peak
      val zc = (1 until n).count(i => (samples(i) >= 0) != (samples(i - 1) >= 0))
      assert(r.getLong(6) == zc)
      assert(r.getDouble(7) ==
        samples.map(s => math.abs(s.toLong)).sum.toDouble / n)
      assert(r.getDouble(8) ==
        math.sqrt(samples.map(s => s.toLong * s.toLong).sum.toDouble / n))
    }
  }

  test("a corrupt WAV payload becomes a NULL feature row, not a stage failure") {
    val media = docs.select(col("doc_id"),
      Multimodal.wavEncode(col("doc_id"), col("text")).as("data"))
      .unionByName(Seq((99L, "RIFFjunk".getBytes("US-ASCII")))
        .toDF("doc_id", "data"))
    val f = media.select(col("doc_id"), Multimodal.wavDecode(col("data")).as("f"))
    assert(f.filter(col("f").isNull).select(col("doc_id"))
      .as[Long].collect().toSeq == Seq(99L))
    assert(f.filter(col("f").isNotNull).count() == 3)
  }

  test("aHash is resolution-tolerant: a 2x nearest-neighbor upscale hashes identically") {
    val base = PpmCodec.decode(PpmCodec.encode(9, 7,
      Array.tabulate(9 * 7 * 3)(i => ((i * 131 + 17) % 256).toByte))).get
    // up(r, c) = base(r/2, c/2); the 8x8 sample grid composes floors:
    // floor(floor(i*2h/8)/2) = floor(i*h/8), so samples hit the SAME
    // source pixels and the hash is bit-identical
    val up = PpmCodec.Image(18, 14, Array.tabulate(18 * 14 * 3) { i =>
      val p = i / 3; val ch = i % 3
      val r = p / 18; val c = p % 18
      base.pixels(((r / 2) * 9 + c / 2) * 3 + ch)
    })
    assert(PpmCodec.aHash(up) == PpmCodec.aHash(base))
  }

  test("aHash: identical payloads collide, a strong local edit moves few bits, " +
    "malformed payloads are NULL rows") {
    val media = docs.select(col("doc_id"),
      Multimodal.ppmEncode(col("doc_id"), col("text")).as("data"))
    val h = media.select(col("doc_id"), Multimodal.ppmAHash(col("data")).as("ph"))
      .as[(Long, Long)].collect().toMap
    // same (doc_id, text) → same payload → same hash, via the expression path
    val h2 = media.select(Multimodal.ppmAHash(col("data"))).as[Long].collect()
    assert(h2.toSet == h.values.toSet && h.size == 3)
    // on a HIGH-CONTRAST image (half black / half white, margins of
    // ~127 around the mean) flipping one sampled pixel flips exactly
    // its own bit: the mean moves by 255/64 ≈ 4, far inside every other
    // sample's margin. (On a near-flat image — like these cycled-text
    // payloads — a local edit legitimately moves MANY borderline bits;
    // that is aHash semantics, not a defect.)
    val contrast = PpmCodec.decode(PpmCodec.encode(8, 8,
      Array.tabulate(8 * 8 * 3) { i => if ((i / 3) % 8 < 4) 0.toByte else 255.toByte })).get
    val px = contrast.pixels.clone()
    px(0) = 255.toByte; px(1) = 255.toByte; px(2) = 255.toByte // pixel (0,0) → white
    val edited = PpmCodec.aHash(PpmCodec.Image(8, 8, px))
    assert(java.lang.Long.bitCount(edited ^ PpmCodec.aHash(contrast)) == 1)
    // malformed payload → NULL hash, not a stage failure
    val withJunk = media.unionByName(
      Seq((99L, "P6 not really".getBytes("US-ASCII"))).toDF("doc_id", "data"))
    val nulls = withJunk.select(col("doc_id"), Multimodal.ppmAHash(col("data")).as("ph"))
      .filter(col("ph").isNull).as[(Long, Option[Long])].collect().map(_._1)
    assert(nulls.toSeq == Seq(99L))
  }

  test("WavWindowEnergy: exact per-window |amp| sums, tail dropped, malformed → NULL") {
    val samples = Array.tabulate(75)(i => ((i * 2731) % 65536 - 32768).toShort)
    val payload = WavCodec.encode(8000, samples)
    val got = Seq(Tuple1(payload)).toDF("data")
      .select(Multimodal.wavWindowEnergy(col("data"), 32).as("w"))
      .as[Seq[Long]].collect().head
    // 75 samples / 32 → 2 full windows; the 11-sample tail is dropped
    assert(got.length == 2)
    (0 until 2).foreach { w =>
      val expected = (w * 32 until (w + 1) * 32)
        .map(i => math.abs(samples(i).toLong)).sum
      assert(got(w) == expected, s"window $w")
    }
    val junk = Seq(Tuple1("RIFFnope".getBytes("US-ASCII"))).toDF("data")
      .select(Multimodal.wavWindowEnergy(col("data"), 32).as("w"))
      .as[Option[Seq[Long]]].collect().head
    assert(junk.isEmpty)
  }

  test("m08 segmentation equals a driver-side recompute from the codec") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("m08_audio_segments")(spark, dir)
      .as[(Long, Int, Long, Long, Long)].collect().toSet
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val expected = corpus.flatMap { case (id, text) =>
      // re-render the payload through the production encoder + parser
      val payload = Seq((id, text)).toDF("doc_id", "text")
        .select(Multimodal.wavEncode(col("doc_id"), col("text")))
        .collect().head.getAs[Array[Byte]](0)
      val a = WavCodec.decode(payload).get
      val wins = a.samples.grouped(32).filter(_.length == 32)
        .map(_.map(s => math.abs(s.toLong)).sum).toArray
      val total = wins.sum
      val active = wins.zipWithIndex
        .filter { case (w, _) => w * wins.length > total }.map(_._2)
      // gaps-and-islands on active window indices
      val segs = active.foldLeft(List.empty[List[Int]]) {
        case (acc, i) if acc.nonEmpty && acc.head.head == i - 1 =>
          (i :: acc.head) :: acc.tail
        case (acc, i) => List(i) :: acc
      }.map(_.reverse).reverse
      segs.zipWithIndex.map { case (seg, k) =>
        (id, k + 1, seg.head.toLong, seg.length.toLong,
          seg.map(wins(_)).sum)
      }
    }.toSet
    assert(got == expected)
  }

  test("audioFingerprint: delta-sign law vs direct recompute; text-determined, id-independent") {
    // ids 5 and 198 differ mod 193 (different sample COUNTS n) but share
    // text — the fingerprint reads only the first 64 samples, which are a
    // pure function of text, so re-publication under a new id (and a new
    // duration) still collides
    val fps = Seq((5L, "the quick brown fox"), (198L, "the quick brown fox"),
        (7L, "a different document entirely"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        Multimodal.wavWindowEnergy(
          Multimodal.wavEncode(col("doc_id"), col("text")), 1).as("amps"))
      .select(col("doc_id"), Multimodal.audioFingerprint(col("amps")).as("afp"),
        col("amps"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
    for ((id, (fp, amps)) <- fps) {
      var want = 0L
      for (b <- 0 to 62) if (amps(b + 1) > amps(b)) want |= 1L << b
      assert(fp == want, s"doc $id: direct recompute")
      assert(fp >= 0L, "bit 63 never set")
    }
    assert(fps(5L)._1 == fps(198L)._1, "same text, different ids/durations")
    assert(fps(5L)._1 != fps(7L)._1, "different text separates")
  }
}

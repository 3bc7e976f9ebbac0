package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{Fnv, PpmCodec}
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
}

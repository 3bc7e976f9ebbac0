package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.Fnv
import graft.multimodal.Multimodal

/** Multimodal decode plumbing: the expression path and the mapPartitions
  * path must agree with the codec spec and each other. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world"),
    (2L, "a slightly longer payload 12345"),
    (3L, "x")).toDF("doc_id", "text")

  test("decodePipeline: checksum/n_bytes/bins match the codec spec exactly") {
    val rows = Multimodal.decodePipeline(docs).orderBy(col("doc_id")).collect()
    val texts = Seq("hello world", "a slightly longer payload 12345", "x")
    rows.zip(texts).foreach { case (r, t) =>
      val bytes = t.getBytes("UTF-8")
      assert(r.getAs[Long]("n_bytes") == bytes.length)
      assert(r.getAs[Long]("checksum") == Fnv.hashBytes(bytes))
      val expected = Multimodal.FakeCodec.decode(bytes)
      (0 until 8).foreach(b => assert(r.getAs[Double](s"h$b") == expected(b)))
      assert(math.abs((0 until 8).map(b => r.getAs[Double](s"h$b")).sum - 1.0) < 1e-12)
    }
  }

  test("mapPartitions codec path (real-codec shape) agrees with the expression path") {
    val viaDs = Multimodal.decodeFeatures(Multimodal.toMediaTable(docs))
      .collect().map(f => (f.doc_id, f.checksum, f.feature.toSeq)).sortBy(_._1)
    val viaExpr = Multimodal.decodePipeline(docs).orderBy(col("doc_id")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("checksum"),
        (0 until 8).map(b => r.getAs[Double](s"h$b"))))
    viaDs.zip(viaExpr).foreach { case ((id1, c1, f1), (id2, c2, f2)) =>
      assert(id1 == id2 && c1 == c2 && f1 == f2.toSeq)
    }
  }

  test("toMediaTable: binary payload with typed metadata") {
    val m = Multimodal.toMediaTable(docs).orderBy(col("doc_id")).collect().head
    assert(m.getAs[Array[Byte]]("data").toSeq == "hello world".getBytes("UTF-8").toSeq)
    assert(m.getAs[String]("mime") == "text/plain")
    assert(m.getAs[Long]("n_bytes") == 11L)
  }
}

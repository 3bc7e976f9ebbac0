package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{Fnv, Hashing, TextFunctions => TF}

/** Custom Catalyst hash expressions: SimHash64, RollingHash, FnvChecksum,
  * ByteHistogram, hamming distance. */
class HashingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("simhash64 is deterministic and equal for equal token streams") {
    val sigs = Seq("the quick brown fox", "the quick brown fox", "a different text")
      .toDF("t").select(Hashing.simhash64(TF.tokens(col("t")))).as[Long].collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("zorder interleaves bits per the Morton spec and masks to `bits`") {
    import graft.functions.ZOrder
    // reference: place bit i of a at 2i, bit i of b at 2i+1
    def ref(a: Long, b: Long, bits: Int): Long = {
      val m = (1L << bits) - 1
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((a & m) >>> i) & 1L) << (2 * i) | (((b & m) >>> i) & 1L) << (2 * i + 1)
      }
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (1023L, 511L),
      ((1L << 21) - 1, 0L), ((1L << 22) + 7L, 9L)) // last: masking applies
    val got = cases.toDF("a", "b")
      .select(ZOrder.zorder(col("a"), col("b"), 21)).as[Long].collect()
    assert(got.toSeq == cases.map { case (a, b) => ref(a, b, 21) })
    // adjacent cells interleave into adjacent z-values
    assert(ref(1, 0, 21) == 1L && ref(0, 1, 21) == 2L && ref(1, 1, 21) == 3L)
  }

  test("z-order layout: chunks of the sorted grid are square blocks, not slivers") {
    import graft.functions.ZOrder
    // 32×32 grid, z-sorted, cut into 16 chunks of 64 rows (the row-group
    // stand-in): every chunk's bounding box is exactly 8×8 — a scan
    // filtered on EITHER dimension prunes 3/4 of the chunks. A
    // single-column sort would make (x, y)-slivers 1×32 wide: ANY filter
    // on y touches every chunk.
    val grid = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val z = grid.toDF("x", "y")
      .withColumn("z", ZOrder.zorder(col("x"), col("y"), 6))
      .orderBy(col("z")).as[(Long, Long, Long)].collect()
    z.grouped(64).foreach { chunk =>
      val xs = chunk.map(_._1); val ys = chunk.map(_._2)
      assert(xs.max - xs.min == 7 && ys.max - ys.min == 7,
        s"chunk bbox ${xs.min}-${xs.max} × ${ys.min}-${ys.max}")
    }
  }

  test("hammingDist: zero on self, 64 on complement") {
    val out = Seq((7L, 7L), (0L, -1L), (0L, 1L)).toDF("a", "b")
      .select(Hashing.hammingDist(col("a"), col("b"))).as[Int].collect()
    assert(out.toSeq == Seq(0, 64, 1))
  }

  test("rollingHash is order-sensitive and matches the FNV/polynomial spec") {
    val hs = Seq(Seq("a", "b"), Seq("b", "a"), Seq("a")).toDF("tk")
      .select(Hashing.rollingHash(col("tk"))).as[Long].collect()
    assert(hs(0) != hs(1))
    // single token: H = FNV-1a(token)
    assert(hs(2) == Fnv.hashBytes("a".getBytes("UTF-8")))
    // two tokens: H = h(a)·P + h(b) with long wraparound
    val P = 1099511628211L
    val expected = Fnv.hashBytes("a".getBytes("UTF-8")) * P + Fnv.hashBytes("b".getBytes("UTF-8"))
    assert(hs(0) == expected)
  }

  test("MinHashSignature expression equals the builtin-HOF minhash formulation") {
    val df = Seq(Seq("aa", "bb", "cc", "dd", "ee")).toDF("sh")
    val h0 = TF.shingleHashes(col("sh"))
    val viaExpr = df.select(TF.minhashFromHashes(h0, 16)).as[Seq[Long]].head()
    val viaHof = df.select(transform(sequence(lit(0), lit(15)),
      j => array_min(transform(h0, h => xxhash64(h, j))))).as[Seq[Long]].head()
    assert(viaExpr == viaHof)
  }

  test("FnvMinHashSignature equals per-token brute force over MinHashMix") {
    import graft.functions.MinHashMix
    val toks = Seq("key", "agg", "row", "zebra", "table")
    val got = Seq(toks).toDF("tk")
      .select(Hashing.fnvMinhashSignature(col("tk"), 32)).as[Seq[Long]].head()
    val exp = (0 until 32).map { j =>
      toks.map(t => MinHashMix.mix(Fnv.hashBytes(t.getBytes("UTF-8")), j)).min
    }
    assert(got == exp)
    // empty token array -> neutral signature (Long.MaxValue everywhere),
    // the identity element of the element-wise-min merge
    val empty = Seq(Seq.empty[String]).toDF("tk")
      .select(Hashing.fnvMinhashSignature(col("tk"), 4)).as[Seq[Long]].head()
    assert(empty == Seq.fill(4)(Long.MaxValue))
  }

  test("fnvChecksum over binary equals Fnv.hashBytes") {
    val bytes = "payload-123".getBytes("UTF-8")
    val got = Seq("payload-123").toDF("t")
      .select(Hashing.fnvChecksum(col("t").cast("binary"))).as[Long].head()
    assert(got == Fnv.hashBytes(bytes))
  }

  test("NfcNormalize: composes decomposed sequences, identity on normalized, null-safe") {
    val rows = Seq(
      Some("áb"),         // decomposed a + combining acute → á (U+00E1)
      Some("plain ascii"),      // already NFC: unchanged
      Some("á"),           // already composed: unchanged
      Some("ë́"),    // e + diaeresis + acute → ế-like composed form
      Some(""),
      None)
    val got = rows.toDF("t")
      .select(Hashing.nfcNormalize(col("t"))).as[Option[String]].collect()
    rows.zip(got).foreach {
      case (Some(in), out) =>
        assert(out.contains(java.text.Normalizer.normalize(
          in, java.text.Normalizer.Form.NFC)), s"input ${in.toList}")
      case (None, out) => assert(out.isEmpty)
    }
    assert(got(0).get == "áb" && got(0).get.length == 2)
  }

  test("law: NfcNormalize is idempotent and agrees with the JDK on random " +
       "combining-mark strings") {
    val rnd = new scala.util.Random(31)
    val marks = Seq('\u0301', '\u0308', '\u0327', '\u0300', '\u0303')
    val bases = "aeiouncAEOU bdf".toSeq
    val strs = (1 to 200).map { _ =>
      (0 to rnd.nextInt(12)).map { _ =>
        val b = bases(rnd.nextInt(bases.length)).toString
        if (rnd.nextBoolean()) b + marks(rnd.nextInt(marks.length)) else b
      }.mkString
    }
    val once = strs.toDF("t")
      .select(Hashing.nfcNormalize(col("t"))).as[String].collect().toSeq
    val twice = once.toDF("t")
      .select(Hashing.nfcNormalize(col("t"))).as[String].collect().toSeq
    strs.lazyZip(once).lazyZip(twice).foreach { (in, o, t2) =>
      assert(o == java.text.Normalizer.normalize(
        in, java.text.Normalizer.Form.NFC), s"agreement on ${in.toList}")
      assert(t2 == o, s"not idempotent on ${in.toList}")
    }
  }

  test("byteHistogram: normalized bins matching a hand computation, summing to 1") {
    val s = "abcdefgh" // ords 97..104 → bins 1..7,0 one hit each
    val hist = Seq(s).toDF("t")
      .select(Hashing.byteHistogram(col("t").cast("binary"), 8)).as[Seq[Double]].head()
    assert(hist.length == 8)
    assert(hist.forall(_ == 0.125))
    assert(math.abs(hist.sum - 1.0) < 1e-12)
  }

  test("ShingleHashSet == sorted distinct builtin xxhash64 of the string shingles") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog the quick brown fox",
      "ab cd",  // short doc: collapses to one whole-text shingle
      "").toDF("t")
    val viaExpr = df.select(
      Hashing.shingleHashSet(TF.tokens(col("t")), 3)).as[Seq[Long]].collect()
    val viaStrings = df.select(array_sort(array_distinct(transform(
      TF.shinglesFromTokens(TF.tokens(col("t")), 3), s => xxhash64(s)))))
      .as[Seq[Long]].collect()
    assert(viaExpr.toSeq == viaStrings.toSeq)
    // sorted ascending — the SortedLongIntersectCount input contract
    viaExpr.foreach(hs => assert(hs == hs.sorted))
  }

  test("sortedIntersectCount == |array_intersect| on shingle-hash sets") {
    val docs = Seq(
      ("a b c d e f g h", "c d e f g h i j"),
      ("x y z", "p q r"),
      ("same text here okay", "same text here okay")).toDF("ta", "tb")
      .select(Hashing.shingleHashSet(TF.tokens(col("ta")), 3).as("ha"),
        Hashing.shingleHashSet(TF.tokens(col("tb")), 3).as("hb"))
    val viaMerge = docs.select(Hashing.sortedIntersectCount(col("ha"), col("hb")))
      .as[Int].collect()
    val viaBuiltin = docs.select(size(array_intersect(col("ha"), col("hb"))))
      .as[Int].collect()
    assert(viaMerge.toSeq == viaBuiltin.toSeq)
    assert(viaMerge(1) == 0 && viaMerge(2) > 0)
  }

  test("sigMatchCount == the zip_with positional-equality formulation") {
    val df = Seq((Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 7L))).toDF("a", "b")
    val viaExpr = df.select(Hashing.sigMatchCount(col("a"), col("b"))).as[Int].head()
    val viaHof = df.select(size(filter(zip_with(col("a"), col("b"),
      (x, y) => x === y), m => m))).as[Int].head()
    assert(viaExpr == 2 && viaExpr == viaHof)
  }

  test("WordShingles drops null tokens without separators (concat_ws semantics)") {
    val df = spark.range(1).select(
      array(lit("a"), lit(null).cast("string"), lit("b"), lit("c")).as("tk4"),
      array(lit("a"), lit(null).cast("string")).as("tk2"))
    val long = df.select(TF.shinglesFromTokens(col("tk4"), 3)).as[Seq[String]].head()
    assert(long == Seq("a b", "b c"))
    val short = df.select(TF.shinglesFromTokens(col("tk2"), 3)).as[Seq[String]].head()
    assert(short == Seq("a"))
    // and the hashed path agrees with the string path on null-bearing input
    val viaHash = df.select(Hashing.shingleHashSet(col("tk4"), 3)).as[Seq[Long]].head()
    val viaStr = df.select(array_sort(transform(
      TF.shinglesFromTokens(col("tk4"), 3), s => xxhash64(s)))).as[Seq[Long]].head()
    assert(viaHash == viaStr)
  }

  private def probeWindowSet(lb: Int, k: Int): Seq[(Int, Int)] = {
    import graft.functions.PassJoinProbeWindows
    val arr = PassJoinProbeWindows(
        org.apache.spark.sql.catalyst.expressions.Literal(lb), k).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2); (r.getInt(0), r.getInt(1))
    }
  }

  test("passjoin probe windows: distinct, in-bounds, exactly the multi-match-aware set, strictly inside the r17 set") {
    // reference (r18): a literal transcription of the multi-match-aware
    // substring-selection lemma (Li/Deng/Feng ICDE'11) — for 0-based
    // segment i of a partner of length la, with Δ = lb − la, the probe
    // window is [pa − i, pa + i] ∩ [pa + Δ − (k−i), pa + Δ + (k−i)].
    // The expression must emit EXACTLY this set: missing one would be a
    // recall bug (the lemma's witness segment could be skipped); extras
    // re-grow the probe volume the selection exists to cut.
    def ref(lb: Int, k: Int): Set[(Int, Int)] = {
      val nSeg = (k + 1).toDouble
      (for {
        la <- math.max(lb - k, 1) to (lb + k)
        delta = lb - la
        i <- 0 to k
        s0 = math.floor(la.toDouble * i.toDouble / nSeg).toInt
        e0 = math.floor(la.toDouble * (i + 1).toDouble / nSeg).toInt
        len = e0 - s0
        if len > 0
        pa = s0 + 1
        p <- math.max(math.max(pa - i, pa + delta - (k - i)), 1) to
             math.min(math.min(pa + i, pa + delta + (k - i)), lb - len + 1)
      } yield (p, len)).toSet
    }
    // the r17 window set (uniform ±k around every anchor) — the new set
    // must stay inside it, so the join's |p − pa| ≤ k filter semantics
    // are untouched and probe volume can only shrink
    def refR17(lb: Int, k: Int): Set[(Int, Int)] = {
      val nSeg = (k + 1).toDouble
      val anchors = for {
        la <- math.max(lb - k, 1) to (lb + k)
        i <- 0 to k
        s0 = math.floor(la.toDouble * i.toDouble / nSeg).toInt
        e0 = math.floor(la.toDouble * (i + 1).toDouble / nSeg).toInt
        if e0 - s0 > 0
      } yield (s0 + 1, e0 - s0)
      (for {
        (pa, len) <- anchors
        p <- math.max(pa - k, 1) to math.min(pa + k, lb - len + 1)
      } yield (p, len)).toSet
    }
    for (k <- Seq(0, 1, 3, 8); lb <- Seq(1, 2, k + 1, 2 * k + 1, 44, 160)) {
      val got = probeWindowSet(lb, k)
      assert(got.distinct.size == got.size, s"duplicate probes at lb=$lb k=$k")
      got.foreach { case (p, len) =>
        assert(p >= 1 && len >= 1 && p + len - 1 <= lb,
          s"out-of-bounds probe ($p, $len) at lb=$lb k=$k")
      }
      assert(got.toSet == ref(lb, k), s"probe set mismatch at lb=$lb k=$k")
      assert(got.toSet.subsetOf(refR17(lb, k)),
        s"probe escaped the r17 filter-reachable set at lb=$lb k=$k")
      // k = 0 degenerates to exact match — both selections coincide
      if (k == 0) assert(got.toSet == refR17(lb, k))
    }
  }

  test("passjoin probe windows: candidate recall — every ed<=k pair meets at a (segment, window) match") {
    // the lemma END-TO-END, independent of both enumerations: apply j ≤ k
    // random edits to a, then some pigeonhole segment of a must occur in
    // b at an emitted probe position, under the join's own filters
    // (|la−lb| ≤ k and |p−pa| ≤ k). 500 random scripts per k.
    val rnd = new scala.util.Random(181)
    for (k <- Seq(1, 3, 8); _ <- 1 to 500) {
      val la0 = k + 1 + rnd.nextInt(50)
      val a = Array.fill(la0)(('a' + rnd.nextInt(4)).toChar).mkString
      var b = a
      for (_ <- 1 to rnd.nextInt(k + 1)) {
        val op = rnd.nextInt(3)
        val pos = if (b.isEmpty) 0 else rnd.nextInt(b.length)
        b = op match {
          case 0 if b.nonEmpty => b.take(pos) + b.drop(pos + 1)        // delete
          case 1 if b.nonEmpty =>                                      // replace
            b.updated(pos, ('a' + rnd.nextInt(4)).toChar)
          case _ => b.take(pos) + ('a' + rnd.nextInt(4)).toChar + b.drop(pos) // insert
        }
      }
      val (la, lb) = (a.length, b.length)
      if (lb >= 1) {
        val nSeg = (k + 1).toDouble
        val segs = for {
          i <- 0 to k
          s0 = math.floor(la.toDouble * i.toDouble / nSeg).toInt
          e0 = math.floor(la.toDouble * (i + 1).toDouble / nSeg).toInt
          if e0 - s0 > 0
        } yield (s0 + 1, a.substring(s0, e0))
        val probes = probeWindowSet(lb, k)
        val hit = segs.exists { case (pa, seg) =>
          probes.exists { case (p, len) =>
            len == seg.length && math.abs(p - pa) <= k &&
              b.regionMatches(p - 1, seg, 0, len)
          }
        }
        assert(hit, s"recall miss: a=$a b=$b k=$k")
      }
    }
  }
}

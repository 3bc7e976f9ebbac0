package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, TextFunctions => TF}
import graft.operators.{Dedup, Relational}

/** MinHash aggregate, connected components, BPE counting, distributed
  * SERIAL ids. */
class AggregatesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("minhashAgg equals the array-expression minhash over the same elements") {
    val docs = Seq(
      (1L, Seq("aa", "bb", "cc", "dd")),
      (2L, Seq("bb", "cc")),
      (3L, Seq("zz"))).toDF("doc_id", "sh")
    val k = 32
    val viaArray = docs
      .select(col("doc_id"), TF.minhashFromHashes(TF.shingleHashes(col("sh")), k).as("sig"))
      .orderBy(col("doc_id")).as[(Long, Seq[Long])].collect()
    val viaAgg = docs
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .groupBy(col("doc_id"))
      .agg(Hashing.minhashAgg(xxhash64(col("s")), k).as("sig"))
      .orderBy(col("doc_id")).as[(Long, Seq[Long])].collect()
    assert(viaArray.toSeq == viaAgg.toSeq)
  }

  test("law: two-level sketch (per-row signature + minhashMergeAgg) equals per-element minhashAgg") {
    // min commutes with min: folding per-doc signatures element-wise must
    // give the same group sketch as aggregating every element hash
    val docs = Seq(
      ("s1", Seq("aa", "bb", "cc", "dd")),
      ("s1", Seq("bb", "cc", "ee")),
      ("s2", Seq("zz")),
      ("s2", Seq("zz", "aa", "qq"))).toDF("src", "sh")
    val k = 32
    val viaMerge = docs
      .select(col("src"), TF.minhashFromHashes(TF.shingleHashes(col("sh")), k).as("doc_sig"))
      .groupBy(col("src")).agg(Hashing.minhashMergeAgg(col("doc_sig"), k).as("sig"))
      .orderBy(col("src")).as[(String, Seq[Long])].collect()
    val viaElements = docs
      .select(col("src"), explode(col("sh")).as("s"))
      .groupBy(col("src")).agg(Hashing.minhashAgg(xxhash64(col("s")), k).as("sig"))
      .orderBy(col("src")).as[(String, Seq[Long])].collect()
    assert(viaMerge.toSeq == viaElements.toSeq)
  }

  test("minhashAgg partial-merge invariance: same result at any parallelism") {
    val elems = (0 until 500).map(i => (i % 7L, s"elem$i"))
    val df1 = spark.createDataFrame(elems).toDF("g", "e").repartition(1)
    val df8 = spark.createDataFrame(elems).toDF("g", "e").repartition(8)
    def sig(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("g")).agg(Hashing.minhashAgg(xxhash64(col("e")), 64).as("sig"))
      .orderBy(col("g")).as[(Long, Seq[Long])].collect().toSeq
    assert(sig(df1) == sig(df8))
  }

  test("minhashEstJaccard approximates true Jaccard on group sketches") {
    val a = (0 until 100).map(i => ("a", s"x$i"))
    val b = (50 until 150).map(i => ("b", s"x$i")) // true J = 50/150
    val sigs = spark.createDataFrame(a ++ b).toDF("g", "e")
      .groupBy(col("g")).agg(Hashing.minhashAgg(xxhash64(col("e")), 256).as("sig"))
    val est = sigs.as("x").join(sigs.as("y"), col("x.g") < col("y.g"))
      .select(Hashing.minhashEstJaccard(col("x.sig"), col("y.sig"))).as[Double].head()
    assert(math.abs(est - 1.0 / 3.0) < 0.12, s"est=$est")
  }

  test("a05 KMV set ops: union/intersection estimates within sketch error " +
       "bounds of the exact twins on every type pair") {
    val rows = SparkEntry.queries("a05_sketch_setops")(
        spark, "/root/testdata/sf0.001")
      .as[(String, String, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (ta, tb, exU, exI, estU, estI) =>
      // KMV k=64: σ ≈ 1/√(k−2) ≈ 0.127 relative on the union; 3σ bound
      assert(math.abs(estU - exU) / exU <= 0.38,
        s"($ta,$tb) union est $estU vs exact $exU")
      // intersection error is ADDITIVE in union scale (ρ/k is a
      // binomial proportion over the merged sketch)
      assert(math.abs(estI - exI) <= 0.4 * exU,
        s"($ta,$tb) inter est $estI vs exact $exI (union $exU)")
    }
  }

  test("connectedComponents: chains collapse transitively, min id wins") {
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (star)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (21L, 20L), (21L, 22L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs)
      .orderBy(col("doc_id")).as[(Long, Long)].collect().toSeq
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("law: DISTRIBUTED connectedComponents equals union-find on random pair graphs") {
    val gen = Gen.listOfN(12, for {
      a <- Gen.choose(0L, 15L); b <- Gen.choose(0L, 15L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
    val prop = Prop.forAll(gen) { pairs =>
      pairs.isEmpty || {
        // exercise the shuffle-based path explicitly (the public API
        // dispatches small graphs to the driver-side union-find)
        val got = Dedup.connectedComponentsDistributed(pairs.toDF("doc_a", "doc_b"))
          .as[(Long, Long)].collect().toMap
        // reference union-find
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        pairs.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        parent.keys.forall(x => got(x) == find(x))
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(3), prop)
    assert(res.passed, res.status.toString)
  }

  test("distributed CC: a 200-node chain converges in O(log d) rounds (shortcutting)") {
    // diameter 199: one-hop-per-round propagation would need ~199 rounds;
    // propagate+shortcut reaches fixpoint within ~log2(199)+slack
    val edges = (0 until 199).map(i => (i.toLong, (i + 1).toLong)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponentsDistributed(edges, maxIter = 15)
      .as[(Long, Long)].collect()
    assert(got.length == 200)
    assert(got.forall(_._2 == 0L))
  }

  test("distributed CC throws on non-convergence instead of returning partial labels") {
    val edges = (0 until 199).map(i => (i.toLong, (i + 1).toLong)).toDF("doc_a", "doc_b")
    intercept[IllegalStateException] {
      Dedup.connectedComponentsDistributed(edges, maxIter = 2)
    }
  }

  test("distributed CC on an empty edge set returns an empty labeling") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponentsDistributed(empty).count() == 0L)
  }

  test("kmvSketch keeps exactly the k smallest distinct hashes, unsigned-ascending") {
    val df = (1 to 300).map(i => ("g", s"u$i")).toDF("g", "u")
    val k = 16
    val sk = df.groupBy(col("g"))
      .agg(Hashing.kmvSketch(xxhash64(col("u")), k).as("kmv"))
      .select(col("kmv")).as[Seq[Long]].head()
    assert(sk.length == k)
    // ascending in UNSIGNED order
    assert(sk.sliding(2).forall {
      case Seq(a, b) => java.lang.Long.compareUnsigned(a, b) < 0
      case _ => true
    })
    // equals the brute-force bottom-k of the distinct hash set (hash
    // recomputed independently of the aggregate's eval path)
    def xx64(s: String): Long = {
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
    }
    val all = (1 to 300).map(i => xx64(s"u$i")).distinct
      .sortWith((a, b) => java.lang.Long.compareUnsigned(a, b) < 0).take(k)
    assert(sk == all)
  }

  test("kmvSketch partial-merge invariance: same sketch at any parallelism") {
    val rows = (0 until 400).map(i => (i % 3L, s"v${i % 97}"))
    def sk(n: Int) = spark.createDataFrame(rows).toDF("g", "v").repartition(n)
      .groupBy(col("g")).agg(Hashing.kmvSketch(xxhash64(col("v")), 32).as("kmv"))
      .orderBy(col("g")).as[(Long, Seq[Long])].collect().toSeq
    assert(sk(1) == sk(8))
  }

  test("kmvEstimate: exact below k, within ~3/sqrt(k) above it") {
    val k = 64
    def est(n: Int): Double = {
      val df = (1 to n).map(i => ("g", s"user$i")).toDF("g", "u")
      df.groupBy(col("g")).agg(Hashing.kmvSketch(xxhash64(col("u")), k).as("kmv"))
        .select(Hashing.kmvEstimate(col("kmv"), k)).as[Double].head()
    }
    assert(est(40) == 40.0) // unsaturated sketch counts exactly
    val e = est(5000)
    assert(math.abs(e / 5000.0 - 1.0) < 3.0 / math.sqrt(k.toDouble), s"est=$e")
  }

  test("bpeTokenCount: letter runs, digit runs, single marks") {
    val out = Seq("Hello, world 42!", "a1b2", "").toDF("t")
      .select(TF.bpeTokenCount(col("t"))).as[Int].collect()
    // "hello" "," "world" "42" "!" = 5 ; "a" "1" "b" "2" = 4 ; "" = 0
    assert(out.toSeq == Seq(5, 4, 0))
  }

  test("withSerialIdDistributed: dense 1..n ids in global order, no single-task window") {
    val df = (1 to 97).map(i => ((i * 57) % 97, s"row$i")).toDF("k", "v").repartition(7)
    val ids = Relational.withSerialIdDistributed(df, Seq(col("k")))
    assert(ids.count() == 97)
    val collected = ids.orderBy(col("k")).select(col("id")).as[Long].collect()
    assert(collected.toSeq == (1L to 97L))
    // agrees with the window-based variant on the same order
    val viaWindow = Relational.withSerialId(df, Seq(col("k")))
      .orderBy(col("k")).select(col("id")).as[Int].collect()
    assert(viaWindow.map(_.toLong).toSeq == collected.toSeq)
  }

  test("a06 bloom: lanes equal a driver-side bloom build; no false negatives") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("a06_bloom_filter")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // reference bloom per group from the same element rule, via the same
    // public FNV+byte-field algebra computed in plain Scala
    def positions(k: Long): Seq[Int] = {
      val h = graft.functions.Fnv.hashBytes(s"bloom:$k".getBytes("UTF-8"))
      Seq((h & 255L).toInt, ((h >>> 8) & 255L).toInt)
    }
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderpriority"), col("o_custkey"))
      .as[(String, Long)].collect()
    val el = orders.filter(_._2 % 97 == 0).distinct.groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val custs = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey")).as[Long].collect()
    rows.foreach { case (grp, l0, l1, l2, l3, nMaybe, nActual) =>
      val lanes = Array.fill(4)(0L)
      el(grp).foreach(k => positions(k).foreach(p =>
        lanes(p >> 6) |= (1L << (p & 63))))
      assert(Seq(l0, l1, l2, l3) == lanes.toSeq, s"$grp lanes")
      def maybe(k: Long) = positions(k).forall(p =>
        (lanes(p >> 6) & (1L << (p & 63))) != 0)
      val actual = custs.count(el(grp))
      // no false negatives: every actual member tests positive
      assert(el(grp).forall(maybe), s"$grp false negative")
      assert(nActual == actual && nMaybe == custs.count(maybe), s"$grp counts")
      assert(nMaybe >= nActual, s"$grp maybe < actual")
    }
  }
}

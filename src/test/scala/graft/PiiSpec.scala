package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.pipeline.CorpusPipeline

/** PII detection / scrub / pseudonymization laws on deterministic
  * planted fixtures (the harness corpus carries no PII, so the laws that
  * matter — recall on planted patterns, linkage under keyed tags — are
  * proved here; cross-engine value equality is the t35/t36/d25 oracles'
  * job). */
class PiiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // every pattern class planted at known multiplicity, with hostile
  // placement (start/end of text, back-to-back, shared across rows)
  private val planted = Seq(
    (1L, "alice@corp.example.com wrote see 10.0.0.1 or +1-555-0100 id 123-45-6789 end"),
    (2L, "plain text no identifiers at all"),
    (3L, "dual bob@x.org and bob@x.org again plus 192.168.001.255"),
    (4L, "tail case ends with carol.o'brien's mail carol+spam@mail.example.io"),
    (5L, "alice@corp.example.com reappears for linkage plus +1-555-0100")
  ).toDF("doc_id", "text")

  private def countAll(df: org.apache.spark.sql.DataFrame, c: String) =
    TF.piiPatterns.map { case (label, p) =>
      label -> df.agg(sum(TF.piiCount(col(c), p))).head.getLong(0)
    }.toMap

  test("planted-PII recall is 1.0: scrub leaves zero matches of any class") {
    val before = countAll(planted, "text")
    assert(before == Map("EMAIL" -> 5L, "PHONE" -> 2L, "IP" -> 2L, "ID" -> 1L),
      s"fixture drifted: $before")
    val after = countAll(planted.select(TF.scrubPii(col("text")).as("t")), "t")
    assert(after.values.forall(_ == 0L), s"scrub left matches: $after")
    // and the scrub is idempotent — tags carry no digits/dots/dashes, so
    // a second pass can never find (or invent) a match
    val once = planted.select(TF.scrubPii(col("text")).as("t"))
    assert(once.select(TF.scrubPii(col("t"))).collect().toSeq ==
      once.select(col("t")).collect().toSeq)
  }

  test("scrub preserves non-PII text verbatim") {
    val t = planted.filter(col("doc_id") === 2)
      .select(TF.scrubPii(col("text"))).head.getString(0)
    assert(t == "plain text no identifiers at all")
    val t1 = planted.filter(col("doc_id") === 1)
      .select(TF.scrubPii(col("text"))).head.getString(0)
    assert(t1 == "<EMAIL> wrote see <IP> or <PHONE> id <ID> end")
  }

  test("pseudonymization: equal values get equal tags across rows, " +
       "unequal values distinct tags, and no raw identifier survives") {
    val ps = planted
      .select(col("doc_id"), TF.pseudonymizePii(col("text"), "k1").as("p"))
      .as[(Long, String)].collect().toMap
    def tagOf(s: String): String =
      "<EMAIL:[0-9]+>".r.findFirstIn(s).getOrElse(sys.error(s"no tag in: $s"))
    // linkage: alice@corp.example.com appears in docs 1 and 5 → same tag
    assert(tagOf(ps(1L)) == tagOf(ps(5L)))
    // distinctness: bob's tag differs from alice's
    assert(tagOf(ps(3L)) != tagOf(ps(1L)))
    // doc 3's duplicated address collapses to ONE tag value used twice
    val tags3 = "<EMAIL:[0-9]+>".r.findAllIn(ps(3L)).toSeq
    assert(tags3.size == 2 && tags3.distinct.size == 1)
    // no raw email/phone remains anywhere
    val scrubbedCounts = countAll(
      planted.select(TF.pseudonymizePii(col("text"), "k1").as("t")), "t")
    assert(scrubbedCounts("EMAIL") == 0L && scrubbedCounts("PHONE") == 0L)
    // phones link too: +1-555-0100 shared by docs 1 and 5
    def phoneTag(s: String): String =
      "<PHONE:[0-9]+>".r.findFirstIn(s).getOrElse(sys.error(s"no tag in: $s"))
    assert(phoneTag(ps(1L)) == phoneTag(ps(5L)))
  }

  test("pseudonymization generalizes to all four classes: IPs and IDs " +
       "link under keyed tags when passed the full pattern set") {
    val ps = planted.select(col("doc_id"),
      TF.pseudonymizePii(col("text"), "k1", TF.piiPatterns).as("p"))
      .as[(Long, String)].collect().toMap
    // doc 1 carries one of each class — all four tagged, nothing raw
    assert("<EMAIL:[0-9]+>".r.findAllIn(ps(1L)).size == 1)
    assert("<PHONE:[0-9]+>".r.findAllIn(ps(1L)).size == 1)
    assert("<IP:[0-9]+>".r.findAllIn(ps(1L)).size == 1)
    assert("<ID:[0-9]+>".r.findAllIn(ps(1L)).size == 1)
    TF.piiPatterns.foreach { case (_, pat) =>
      assert(pat.r.findFirstIn(ps(1L)).isEmpty, s"raw $pat survived") }
    // doc 3's duplicated address still collapses to one tag value, and
    // its IP gets its own class tag
    assert("<IP:[0-9]+>".r.findAllIn(ps(3L)).size == 1)
    // default two-class behavior is unchanged (t36's oracle contract)
    val dflt = planted.filter(col("doc_id") === 1)
      .select(TF.pseudonymizePii(col("text"), "k1")).head.getString(0)
    assert(dflt.contains("10.0.0.1") && dflt.contains("123-45-6789"),
      "default classes must remain EMAIL/PHONE only")
  }

  test("pseudonymization is KEYED: a different key moves every tag") {
    val a = planted.filter(col("doc_id") === 1)
      .select(TF.pseudonymizePii(col("text"), "k1")).head.getString(0)
    val b = planted.filter(col("doc_id") === 1)
      .select(TF.pseudonymizePii(col("text"), "k2")).head.getString(0)
    assert(a != b)
    // same key is deterministic
    val a2 = planted.filter(col("doc_id") === 1)
      .select(TF.pseudonymizePii(col("text"), "k1")).head.getString(0)
    assert(a == a2)
  }

  test("substring-related matches fold in the pinned (length, value) " +
       "order — deterministic output") {
    // xa@b.com contains a@b.com as a literal substring; the short match
    // replaces first (length ascending), so the long match's occurrence
    // is consumed by the short tag and its own fold step no-ops. What
    // matters is that the result is DETERMINISTIC and PII-free — the
    // oracle replays the same order, which t36's hash compare certifies
    // cross-engine.
    val df = Seq((1L, "first a@b.com then xa@b.com done")).toDF("doc_id", "text")
    val p = df.select(TF.pseudonymizePii(col("text"), "k")).head.getString(0)
    assert(!p.contains("a@b.com"), s"raw value survived: $p")
    val p2 = df.select(TF.pseudonymizePii(col("text"), "k")).head.getString(0)
    assert(p == p2)
  }

  test("law: on random corpora with random planted PII, per-class counts " +
       "equal the planted counts, scrub recall is 1.0, and pseudonymize " +
       "tags one-for-one") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // PII-free filler: letters only (cannot match any class — every
    // pattern needs a digit or '@')
    val word = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
    val digits = (n: Int) => Gen.listOfN(n, Gen.numChar).map(_.mkString)
    // letters-only local/domain keeps a planted email from EMBEDDING a
    // phone/id-shaped digit run (the cross-class count hazard); the
    // patterns themselves are pairwise disjoint (TextFunctions doc)
    val email = for {
      l <- word; d <- word; t <- Gen.chooseNum(2, 4).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar))
    } yield s"$l@$d.${t.mkString}"
    val phone = for {
      p <- Gen.oneOf("", "+"); c <- Gen.chooseNum(1, 3).flatMap(digits)
      m <- digits(3); s <- digits(4)
    } yield s"$p$c-$m-$s"
    val ip = Gen.listOfN(4, Gen.chooseNum(0, 255)).map(_.mkString("."))
    val idTok = for { a <- digits(3); b <- digits(2); c <- digits(4) }
      yield s"$a-$b-$c"
    val token: Gen[(String, String)] = Gen.frequency(
      6 -> word.map(("w", _)), 1 -> email.map(("EMAIL", _)),
      1 -> phone.map(("PHONE", _)), 1 -> ip.map(("IP", _)),
      1 -> idTok.map(("ID", _)))
    val doc = Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, token))
    val corpus = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, doc))

    val prop = Prop.forAll(corpus) { ds =>
      val rows = ds.zipWithIndex.map { case (toks, i) =>
        (i.toLong, toks.map(_._2).mkString(" "),
          toks.count(_._1 == "EMAIL").toLong, toks.count(_._1 == "PHONE").toLong,
          toks.count(_._1 == "IP").toLong, toks.count(_._1 == "ID").toLong)
      }
      val df = rows.toDF("doc_id", "text", "e", "p", "i", "d")
      val got = df.select(col("doc_id"),
        TF.piiCount(col("text"), TF.emailPattern).as("ge"),
        TF.piiCount(col("text"), TF.phonePattern).as("gp"),
        TF.piiCount(col("text"), TF.ipv4Pattern).as("gi"),
        TF.piiCount(col("text"), TF.idPattern).as("gd"),
        TF.scrubPii(col("text")).as("clean"),
        TF.pseudonymizePii(col("text"), "law-key").as("pseudo"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getString(5), r.getString(6))).toMap
      rows.forall { case (id, _, e, p, i, d) =>
        val (ge, gp, gi, gd, clean, pseudo) = got(id)
        // counts == planted (the disjointness the patterns guarantee)
        (ge, gp, gi, gd) == ((e, p, i, d)) &&
          // scrub recall 1.0 on every class
          TF.piiPatterns.forall { case (_, pat) =>
            !pat.r.findFirstIn(clean).isDefined } &&
          // pseudonymize: one tag per planted occurrence, zero raw survivors
          "<EMAIL:[0-9]+>".r.findAllIn(pseudo).size == e &&
          "<PHONE:[0-9]+>".r.findAllIn(pseudo).size == p &&
          TF.emailPattern.r.findFirstIn(pseudo).isEmpty &&
          TF.phonePattern.r.findFirstIn(pseudo).isEmpty
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("pipeline: planted PII never reaches the released corpus, and the " +
       "scrub stage rescues a volatile-PII re-crawl from dup leakage") {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // plant a per-doc session email on even docs; re-crawl ships the same
    // text under new ids with a DIFFERENT session value (the d25 shape)
    def crawl(salt: Int) = base.withColumn("text",
      when(col("doc_id") % 2 === 0,
        concat(col("text"), lit(" sess s"),
          (col("doc_id") * 7 + lit(salt)).cast("string"),
          lit("@example.com"))).otherwise(col("text")))
    val recrawl = crawl(2)
      .withColumn("doc_id", col("doc_id") + 500000L)
      .withColumn("source", lit("recrawl"))
    val corpus = CorpusPipeline.run(crawl(1).unionByName(recrawl)).corpus.cache()
    // recall inside the composed pipeline: nothing email-shaped ships
    assert(corpus.agg(sum(TF.piiCount(col("text"), TF.emailPattern)))
      .head.getLong(0) == 0L)
    // the exact-dedup stage saw scrubbed text, so every re-crawl copy is
    // a fingerprint dup of its canonical and exactly one survives: no
    // surviving pair of (id, id+500000) may coexist
    val ids = corpus.select(col("doc_id")).as[Long].collect().toSet
    val leaked = ids.filter(id => id >= 500000L && ids.contains(id - 500000L))
    assert(leaked.isEmpty, s"re-crawl dups survived raw-PII split: $leaked")
    corpus.unpersist()
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.operators.Rtbf

/** Batch right-to-be-forgotten laws: the one-pass multi-request form
  * (ForgetTags kernel + Rtbf driver) must equal the sequential fold of
  * the oracle-verified single forgets (t37/t40's path), in any ledger
  * order, for both tag families — and the store-maintenance hook must
  * rewrite only the partitions that link. */
class RtbfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val key = "rtbf-spec-key"

  // five docs: 1 links to two requests, 2 to one, 3 to none (but carries
  // OTHER identifiers whose tags must survive), 4 has no identifiers,
  // 5 links through an IBAN (the mod-97 class rides the same keyed-tag
  // pseudonymize → linksTo → forget kernels as every other class)
  private val corpus = Seq(
    (1L, "ping alice@a.example and call +1-555-0100 now"),
    (2L, "cc alice@a.example and also bob@b.example"),
    (3L, "only carol@c.example plus +1-555-0199 here"),
    (4L, "no identifiers at all"),
    (5L, "wire DE89370400440532013000 and keep GB82WEST12345698765432")
  ).toDF("doc_id", "text")

  private val requests = Seq(
    "EMAIL" -> "alice@a.example",
    "PHONE" -> "+1-555-0100",
    "IBAN" -> "DE89370400440532013000",
    "EMAIL" -> "ghost@nowhere.example") // matches nothing — must be inert

  private def ledger(reqs: Seq[(String, String)]) = reqs.toDF("label", "value")

  // full class set: the RTBF surface must cover every linkable class,
  // not just the t36 default EMAIL/PHONE pair
  private def pseudo(mac: Boolean) = corpus.select(col("doc_id"),
    (if (mac) TF.pseudonymizePiiMac(col("text"), key, TF.piiClasses)
     else TF.pseudonymizePii(col("text"), key, TF.piiClasses)).as("pseudo"))

  /** The sequential-fold reference: one single-tag forget per request,
    * composed in the given order over the whole corpus, then filtered to
    * the docs any request touched. */
  private def sequentialFold(mac: Boolean,
                             reqs: Seq[(String, String)]): Map[Long, String] = {
    val base = pseudo(mac)
    val folded = reqs.foldLeft(base) { case (df, (label, value)) =>
      df.withColumn("pseudo",
        if (mac) TF.forgetValueMac(col("pseudo"), label, key, value)
        else TF.forgetValue(col("pseudo"), label, key, value))
    }
    val linkedAny = reqs.map { case (label, value) =>
      if (mac) TF.linksToMac(col("pseudo"), label, key, value)
      else TF.linksTo(col("pseudo"), label, key, value)
    }.reduce(_ || _)
    val linkedIds = base.filter(linkedAny).select(col("doc_id"))
      .as[Long].collect().toSet
    folded.filter(col("doc_id").isin(linkedIds.toSeq: _*))
      .as[(Long, String)].collect().toMap
  }

  private def batch(mac: Boolean, reqs: Seq[(String, String)]): Map[Long, String] =
    Rtbf.forgetAll(pseudo(mac), "pseudo", ledger(reqs), key, mac)
      .as[(Long, String)].collect().toMap

  for (mac <- Seq(false, true)) {
    val fam = if (mac) "MAC" else "FNV"
    test(s"$fam batch forget == sequential fold of single forgets, in any ledger order") {
      val expected = sequentialFold(mac, requests)
      assert(expected.keySet == Set(1L, 2L, 5L), "fixture drifted")
      assert(batch(mac, requests) == expected)
      assert(batch(mac, requests.reverse) == expected,
        "ledger order must not matter — tags are disjoint complete spans")
      // untouched linkage survives: doc 2's bob tag is still present
      val bobTag = if (mac) TF.pseudoTagMac("EMAIL", key, "bob@b.example")
                   else TF.pseudoTag("EMAIL", key, "bob@b.example")
      assert(expected(2L).contains(bobTag),
        "non-ledger identifiers must keep their linkage tags")
      assert(expected.values.forall(!_.contains(
        if (mac) TF.pseudoTagMac("EMAIL", key, "alice@a.example")
        else TF.pseudoTag("EMAIL", key, "alice@a.example"))),
        "ledger tags must be gone")
      // the mod-97 class rides the same kernels: doc 5's requested IBAN
      // tag is erased, its NON-requested IBAN keeps its linkage tag
      val gbTag = if (mac) TF.pseudoTagMac("IBAN", key, "GB82WEST12345698765432")
                  else TF.pseudoTag("IBAN", key, "GB82WEST12345698765432")
      assert(expected(5L).contains(gbTag) &&
        expected(5L).contains("<FORGOTTEN>"),
        s"IBAN RTBF semantics drifted: ${expected(5L)}")
    }
  }

  test("empty ledger: forgetAll selects nothing, applyLedger is identity") {
    val empty = Seq.empty[(String, String)].toDF("label", "value")
    assert(Rtbf.forgetAll(pseudo(mac = false), "pseudo", empty, key,
      mac = false).isEmpty)
    val base = pseudo(mac = false).as[(Long, String)].collect().toMap
    assert(Rtbf.applyLedger(pseudo(mac = false), "pseudo", empty, key,
      mac = false).as[(Long, String)].collect().toMap == base)
  }

  test("applyLedger (release form) rewrites linked rows and passes the rest through byte-identical") {
    val out = Rtbf.applyLedger(pseudo(mac = false), "pseudo",
      ledger(requests), key, mac = false).as[(Long, String)].collect().toMap
    val base = pseudo(mac = false).as[(Long, String)].collect().toMap
    val folded = sequentialFold(mac = false, requests)
    assert(out(1L) == folded(1L) && out(2L) == folded(2L))
    assert(out(3L) == base(3L) && out(4L) == base(4L))
  }

  test("ForgetTags kernel: non-ledger tag-shaped spans, unclosed brackets, and adjacent tags") {
    val t1 = TF.pseudoTag("EMAIL", key, "alice@a.example")
    val t2 = TF.pseudoTag("PHONE", key, "+1-555-0100")
    val rows = Seq(
      s"a $t1$t2 b",                       // adjacent tags, both erased
      s"keep <EMAIL:${"9" * 20}> alone",   // tag-shaped but not in the set
      "unclosed < bracket and then < another",
      s"nested << $t1 >> ok",              // '<' noise around a real tag
      s"$t1")                              // the whole row is one tag
      .toDF("p")
    val got = rows.select(TF.forgetTags(col("p"), Seq(t1, t2)).as("p"))
      .as[String].collect().toSeq
    assert(got == Seq(
      "a <FORGOTTEN><FORGOTTEN> b",
      s"keep <EMAIL:${"9" * 20}> alone",
      "unclosed < bracket and then < another",
      "nested << <FORGOTTEN> >> ok",
      "<FORGOTTEN>"))
  }

  test("applyLedgerToStore rewrites ONLY linked partitions and is idempotent") {
    val root = java.nio.file.Files.createTempDirectory("graft_rtbf_store").toString
    val store = s"$root/store"
    // partition 0 links (doc 1), partition 1 does not (docs 3/4),
    // partition 2 links (doc 2)
    def part(b: Long, ids: Seq[Long]) = pseudo(mac = false)
      .filter(col("doc_id").isin(ids: _*)).withColumn("_batch_id", lit(b))
    part(0L, Seq(1L)).unionByName(part(1L, Seq(3L, 4L)))
      .unionByName(part(2L, Seq(2L)))
      .write.partitionBy("_batch_id").parquet(store)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partMtime(b: Long): Long =
      fs.listStatus(new org.apache.hadoop.fs.Path(store, s"_batch_id=$b"))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(_.getModificationTime).max
    val untouchedBefore = partMtime(1L)
    val hit = Rtbf.applyLedgerToStore(spark, store, "pseudo",
      ledger(requests), key, mac = false)
    assert(hit == Seq(0L, 2L), s"linked partitions only: $hit")
    assert(partMtime(1L) == untouchedBefore,
      "an unlinked partition's files must not be rewritten")
    val after = spark.read.parquet(store)
      .select(col("doc_id"), col("pseudo")).as[(Long, String)].collect().toMap
    val folded = sequentialFold(mac = false, requests)
    assert(after(1L) == folded(1L) && after(2L) == folded(2L))
    // idempotent: the ledger is already applied, nothing links now
    assert(Rtbf.applyLedgerToStore(spark, store, "pseudo",
      ledger(requests), key, mac = false).isEmpty)
    // and the staging dir is gone
    assert(!fs.exists(new org.apache.hadoop.fs.Path(store + "_rtbf_staging")))
  }

  test("linksAnyTag (the pushed filter predicate) == forgetTags changed the text") {
    val t1 = TF.pseudoTag("EMAIL", key, "alice@a.example")
    val t2 = TF.pseudoTag("PHONE", key, "+1-555-0100")
    val rows = Seq(
      s"a $t1 b", s"a $t2", "no tags at all", s"fake <EMAIL:${"9" * 20}>",
      "unclosed < only", s"$t1$t2", "< $t1 not a tag literal")
      .toDF("p")
    val got = rows.select(
      TF.linksAnyTag(col("p"), Seq(t1, t2)).as("linked"),
      (TF.forgetTags(col("p"), Seq(t1, t2)) =!= col("p")).as("changed"))
      .collect()
    assert(got.forall(r => r.getBoolean(0) == r.getBoolean(1)),
      "the boolean predicate must decide exactly the rewrite-changes set")
    // and the empty-ledger predicate is constant false
    assert(rows.select(TF.linksAnyTag(col("p"), Seq.empty)).collect()
      .forall(!_.getBoolean(0)))
  }

  test("applyLedgerToStore CRASH WINDOWS: a rerun restores a partition " +
       "whose only copy was left in staging, and an incomplete staging " +
       "write is discarded with the live store untouched") {
    import graft.functions.{TextFunctions => TF}
    val root = java.nio.file.Files.createTempDirectory("graft_rtbf_crash").toString
    val store = s"$root/store"
    def part(b: Long, ids: Seq[Long]) = pseudo(mac = false)
      .filter(col("doc_id").isin(ids: _*)).withColumn("_batch_id", lit(b))
    part(0L, Seq(1L)).unionByName(part(1L, Seq(3L, 4L)))
      .unionByName(part(2L, Seq(2L)))
      .write.partitionBy("_batch_id").parquet(store)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tags = Rtbf.requestTags(ledger(requests), key, mac = false)
    // reproduce the worst window of a crashed run: the staging write
    // COMMITTED (hit partitions 0 and 2, rewritten, _SUCCESS present),
    // partition 0's live dir was deleted, and the process died before
    // the rename — partition 0's only copy is now in staging
    val staging = store + "_rtbf_staging"
    spark.read.parquet(store)
      .filter(col("_batch_id").isin(0L, 2L))
      .withColumn("pseudo", TF.forgetTags(col("pseudo"), tags))
      .write.partitionBy("_batch_id").parquet(staging)
    assert(fs.exists(new org.apache.hadoop.fs.Path(staging, "_SUCCESS")))
    fs.delete(new org.apache.hadoop.fs.Path(store, "_batch_id=0"), true)
    // rerunning the SAME ledger must first settle the staging (restore
    // partition 0, swap partition 2), then find nothing left to forget.
    // freshMillis = 0: the single-writer guard would otherwise treat
    // this just-planted staging as a LIVE concurrent run — the crash
    // being simulated here is, in production, older than the freshness
    // window by the time an operator reruns the ledger
    val hit = Rtbf.applyLedgerToStore(spark, store, "pseudo",
      ledger(requests), key, mac = false, freshMillis = 0L)
    assert(hit.isEmpty, "after recovery the ledger is fully applied")
    val after = spark.read.parquet(store)
      .select(col("doc_id"), col("pseudo")).as[(Long, String)].collect().toMap
    assert(after.keySet == Set(1L, 2L, 3L, 4L), "no document may be lost")
    val folded = sequentialFold(mac = false, requests)
    assert(after(1L) == folded(1L) && after(2L) == folded(2L),
      "restored partitions carry the rewritten content")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(staging)))
    // the other window: a staging dir WITHOUT _SUCCESS (mid-write
    // crash) must be discarded — live store untouched, run proceeds
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$staging/_batch_id=1"))
    val before = spark.read.parquet(store)
      .select(col("doc_id"), col("pseudo")).as[(Long, String)].collect().toMap
    assert(Rtbf.applyLedgerToStore(spark, store, "pseudo",
      ledger(requests), key, mac = false, freshMillis = 0L).isEmpty)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(staging)),
      "partial staging must be discarded")
    assert(spark.read.parquet(store)
      .select(col("doc_id"), col("pseudo")).as[(Long, String)].collect().toMap
      == before, "a discarded partial staging must not touch the store")
  }

  test("ledger past the bound fails loudly instead of truncating") {
    // the failure path itself, at an injected cap of 2 (ADVICE r16: the
    // old form only checked tag dedup, so a dropped require would have
    // passed silently): a 3-request ledger must throw, not truncate
    val three = ledger(Seq(
      "EMAIL" -> "a@y.example", "EMAIL" -> "b@y.example",
      "EMAIL" -> "c@y.example"))
    val e = intercept[IllegalArgumentException] {
      Rtbf.requestTags(three, key, mac = false, cap = 2)
    }
    assert(e.getMessage.contains("exceeds 2 rows"),
      s"loud bound failure expected, got: ${e.getMessage}")
    // at the bound it still works, and duplicates collapse to one tag
    val tags = Rtbf.requestTags(
      ledger(Seq("EMAIL" -> "x@y.example", "EMAIL" -> "x@y.example")),
      key, mac = false, cap = 2)
    assert(tags == Seq(TF.pseudoTag("EMAIL", key, "x@y.example")),
      "duplicate ledger rows must collapse to one tag")
  }

  test("cascadeStores: one ledger pass rewrites the corpus WITH fp " +
       "recompute, purges doc-keyed artifacts partition-targeted, " +
       "purges sidecars, and is idempotent") {
    val root = java.nio.file.Files.createTempDirectory("graft_rtbf_cascade").toString
    val store = s"$root/store"
    val vecStore = s"$root/vectors"
    val cells = s"$root/vectors_cells_n4"
    // main store (doc_id, pseudo, fp, _batch_id): docs 1/2 link
    // (partitions 0 and 2), 3/4 don't (partition 1)
    def part(b: Long, ids: Seq[Long]) = pseudo(mac = false)
      .filter(col("doc_id").isin(ids: _*))
      .withColumn("fp", TF.fingerprint(col("pseudo")))
      .withColumn("_batch_id", lit(b))
    part(0L, Seq(1L)).unionByName(part(1L, Seq(3L, 4L)))
      .unionByName(part(2L, Seq(2L)))
      .write.partitionBy("_batch_id").parquet(store)
    // vector artifact keyed vec_id: partition 10 = {1} (fully purged →
    // dir must VANISH), 11 = {2, 5} (rewritten, 5 survives), 12 = {3}
    // (unlinked — files must not be rewritten)
    Seq((1L, Seq(0.1f, 0.2f), 10L), (2L, Seq(0.3f, 0.4f), 11L),
        (5L, Seq(0.5f, 0.6f), 11L), (3L, Seq(0.7f, 0.8f), 12L))
      .toDF("vec_id", "embedding", "_batch_id")
      .write.partitionBy("_batch_id").parquet(vecStore)
    // unpartitioned cell sidecar over the same ids
    Seq((1L, 0L), (2L, 1L), (3L, 2L), (5L, 3L)).toDF("vec_id", "cell")
      .write.parquet(cells)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mtime(path: String): Long =
      fs.listStatus(new org.apache.hadoop.fs.Path(path))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(_.getModificationTime).max
    val vecUntouched = mtime(s"$vecStore/_batch_id=12")
    val report = Rtbf.cascadeStores(spark, store, "pseudo",
      ledger(requests), key, mac = false,
      derived = Seq("fp" -> TF.fingerprint(col("pseudo"))),
      artifactStores = Seq(vecStore -> "vec_id"),
      sidecars = Seq(cells -> "vec_id"),
      freshMillis = 0L)
    assert(report.corpusPartitions == Seq(0L, 2L))
    assert(report.artifactPartitions(vecStore) == Seq(10L, 11L))
    assert(report.sidecarRowsDropped(cells) == 2L)
    // corpus: linked docs rewritten, fp CONSISTENT on every row
    val after = spark.read.parquet(store)
    val folded = sequentialFold(mac = false, requests)
    val got = after.select(col("doc_id"), col("pseudo"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == folded(1L) && got(2L) == folded(2L))
    assert(after.filter(col("fp") =!= TF.fingerprint(col("pseudo")))
      .count() == 0, "no stale fp may survive the cascade")
    // artifacts: ZERO rows trace to a forgotten doc; others intact
    val vecsAfter = spark.read.parquet(vecStore)
      .select(col("vec_id")).as[Long].collect().toSet
    assert(vecsAfter == Set(3L, 5L),
      s"forgotten docs' vectors must be purged: $vecsAfter")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$vecStore/_batch_id=10")), "a fully-purged partition vanishes")
    assert(mtime(s"$vecStore/_batch_id=12") == vecUntouched,
      "an unlinked artifact partition's files must not be rewritten")
    val cellsAfter = spark.read.parquet(cells)
      .select(col("vec_id")).as[Long].collect().toSet
    assert(cellsAfter == Set(3L, 5L), s"sidecar rows purged: $cellsAfter")
    // idempotent: nothing links any more, nothing is touched
    val again = Rtbf.cascadeStores(spark, store, "pseudo",
      ledger(requests), key, mac = false,
      derived = Seq("fp" -> TF.fingerprint(col("pseudo"))),
      artifactStores = Seq(vecStore -> "vec_id"),
      sidecars = Seq(cells -> "vec_id"),
      freshMillis = 0L)
    assert(again.corpusPartitions.isEmpty &&
      again.artifactPartitions(vecStore).isEmpty &&
      again.sidecarRowsDropped(cells) == 0L)
    // a sidecar purged EMPTY is deleted outright (self-healing absent
    // state), exercised via a sidecar holding only forgotten ids
    val onlyForgotten = s"$root/vectors_cells_n8"
    Seq((1L, 0L), (2L, 1L)).toDF("vec_id", "cell").write.parquet(onlyForgotten)
    assert(Rtbf.purgeSidecar(spark, onlyForgotten, "vec_id",
      Seq(1L, 2L).toDF("doc_id")) == 2L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(onlyForgotten)))
  }

  test("single-maintenance-writer guard: a FRESH staging dir aborts the " +
       "run; checked rename aborts before staging cleanup") {
    val root = java.nio.file.Files.createTempDirectory("graft_rtbf_lock").toString
    val store = s"$root/store"
    pseudo(mac = false).withColumn("_batch_id", lit(0L))
      .write.partitionBy("_batch_id").parquet(store)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // another ledger pass "in flight": staging exists and is fresh
    val staging = new org.apache.hadoop.fs.Path(store + "_rtbf_staging")
    fs.mkdirs(staging)
    val e = intercept[IllegalArgumentException] {
      Rtbf.applyLedgerToStore(spark, store, "pseudo",
        ledger(requests), key, mac = false) // default freshness window
    }
    assert(e.getMessage.contains("in flight"),
      s"live-writer contract violation must be loud, got: ${e.getMessage}")
    assert(fs.exists(staging), "the other run's staging must be untouched")
    fs.delete(staging, true)
    // the checked-swap discipline (ADVICE r16 medium): a rename that
    // FAILS BY RETURNING FALSE (Hadoop's common no-throw failure shape;
    // the local FS masks most of them behind a copy fallback, so the
    // false return is injected here) must abort with the staged-copy
    // message instead of falling through to the staging cleanup that
    // would destroy the partition's only copy
    val staged = new org.apache.hadoop.fs.Path(
      store + "_rtbf_staging/_batch_id=0")
    fs.mkdirs(staged)
    val renameFails = new org.apache.hadoop.fs.RawLocalFileSystem() {
      override def rename(src: org.apache.hadoop.fs.Path,
                          dst: org.apache.hadoop.fs.Path): Boolean = false
    }
    renameFails.initialize(java.net.URI.create("file:///"),
      spark.sparkContext.hadoopConfiguration)
    val e2 = intercept[IllegalArgumentException] {
      Rtbf.swapIn(renameFails, staged,
        new org.apache.hadoop.fs.Path(s"$root/elsewhere/_batch_id=0"))
    }
    assert(e2.getMessage.contains("only copy"),
      s"failed rename must abort loudly, got: ${e2.getMessage}")
    assert(fs.exists(staged),
      "the staged copy must survive the aborted swap for recovery")
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/**
 * Batch right-to-be-forgotten over a pseudonymized corpus — the
 * multi-request production form of the single-tag t37/t40 paths
 * (`/root/reference` has no RTBF surface; this extends the
 * pseudonymization tier the way a real GDPR pipeline must: deletion
 * requests arrive in batches of thousands, and the corpus is scanned
 * ONCE per release, not once per request).
 *
 * Shape at 100 TB: the deletion ledger is tiny relative to the corpus
 * (bounded collect below, same discipline as the other documented
 * driver-side bounds — Dedup's union-find threshold, the k-row top-k
 * store); its tags ship to executors inside one [[graft.functions.ForgetTags]]
 * expression (a broadcast-sized hash set riding a map-only scan), so
 * the rewrite is a single codegen'd pass over the corpus with no join,
 * no shuffle, and cost independent of request count. Tags are
 * driver-computed via the same [[TF.pseudoTag]]/[[TF.pseudoTagMac]]
 * twins the single-request paths use (bit-exact with the engine-side
 * pseudonymizers and the DuckDB oracle).
 */
object Rtbf {

  /** Hard cap on ledger size for the driver-side tag computation: 1M
    * requests × ~40-byte tags ≈ 40 MB on the driver and in the task
    * binary — the practical broadcast bound. A ledger past this size
    * should be split into passes (each pass is idempotent — forgetting
    * an already-forgotten tag is a no-op — so passes compose). */
  val maxLedgerRows = 1000000

  /** Collect the (label, value) deletion ledger and derive each
    * request's linkage tag for the chosen family. Fails loudly past
    * [[maxLedgerRows]] rather than silently truncating. */
  def requestTags(ledger: DataFrame, key: String, mac: Boolean): Seq[String] = {
    val rows = ledger.select(col("label").cast("string"), col("value").cast("string"))
      .limit(maxLedgerRows + 1).collect()
    require(rows.length <= maxLedgerRows,
      s"deletion ledger exceeds $maxLedgerRows rows — split it into passes")
    rows.toSeq.map { r =>
      val (label, value) = (r.getString(0), r.getString(1))
      if (mac) TF.pseudoTagMac(label, key, value)
      else TF.pseudoTag(label, key, value)
    }.distinct
  }

  /** The audit view (t41/t42's contract, the batch twin of t37/t40's):
    * only the documents linked to at least one ledger request, with
    * EVERY ledger tag erased. Linkage is decided by the BOOLEAN
    * [[TF.linksAnyTag]] scan, not by comparing the rewrite to its
    * input: Catalyst pushes the filter below the projection (good —
    * the predicate reaches the scan side and non-linked rows never hit
    * the rewrite), and with a `rewritten != original` predicate that
    * pushdown would re-evaluate the rewrite (plus its whole upstream
    * chain — the CodegenFallback HOFs get no subexpression
    * elimination) twice in the filter and a third time in the
    * surviving projection. One cheap boolean scan per row + one
    * rewrite per LINKED row instead; RtbfSpec pins
    * `linksAnyTag == (forgetTags != input)`. */
  def forgetAll(corpus: DataFrame, pseudoCol: String, ledger: DataFrame,
                key: String, mac: Boolean,
                replacement: String = "<FORGOTTEN>"): DataFrame = {
    val tags = requestTags(ledger, key, mac)
    corpus
      .filter(TF.linksAnyTag(col(pseudoCol), tags))
      .select(corpus.columns.toSeq.map(c =>
        if (c == pseudoCol)
          TF.forgetTags(col(pseudoCol), tags, replacement).as(pseudoCol)
        else col(c)): _*)
  }

  /** The release form: rewrite the WHOLE corpus (linked rows lose their
    * ledger tags, everything else passes through byte-identical) — what
    * a release pipeline applies before shipping. Map-only. */
  def applyLedger(corpus: DataFrame, pseudoCol: String, ledger: DataFrame,
                  key: String, mac: Boolean,
                  replacement: String = "<FORGOTTEN>"): DataFrame = {
    val tags = requestTags(ledger, key, mac)
    corpus.withColumn(pseudoCol, TF.forgetTags(col(pseudoCol), tags, replacement))
  }

  /**
   * Deletion-ledger maintenance over a `_batch_id`-partitioned store
   * (the StreamingIngest store layout) — the hook that lets a streaming
   * corpus carry a deletion ledger: one map-only scan finds the
   * partitions containing linked documents, and ONLY those partitions
   * are rewritten (write-new-generation per partition, then swap), so a
   * ledger touching 3 of 10,000 partitions costs 3 partition rewrites,
   * not a corpus rewrite. Returns the rewritten partition ids.
   *
   * Crash-safety: re-running the ledger repairs EVERY crash window,
   * because the recovery preamble below first settles any leftover
   * staging directory — keyed on its `_SUCCESS` marker:
   *  - staging WITHOUT `_SUCCESS`: the previous run died mid-write;
   *    the live store is untouched (no swap ever starts before the
   *    staging write commits), so the partial staging is discarded;
   *  - staging WITH `_SUCCESS`: the previous run died somewhere in its
   *    swap loop; every staged partition is the rewritten twin of its
   *    live one, so each is swapped in (the live dir, if still
   *    present, is replaced; if the crash hit between delete and
   *    rename, the staged copy is the partition's ONLY copy and the
   *    rename restores it). Completing an old ledger's swap under a
   *    NEW ledger is also correct — deletion requests compose, and the
   *    new pass re-probes everything it swaps in.
   * Without this preamble, a crash between a partition's delete and
   * its rename would leave the only copy in staging, and a rerun's
   * overwrite-mode staging write would destroy it.
   */
  def applyLedgerToStore(spark: SparkSession, storePath: String,
                         pseudoCol: String, ledger: DataFrame, key: String,
                         mac: Boolean,
                         replacement: String = "<FORGOTTEN>"): Seq[Long] = {
    val tags = requestTags(ledger, key, mac)
    if (tags.isEmpty) return Seq.empty
    recoverStaging(spark, storePath)
    val store = spark.read.parquet(storePath)
    // partition ids holding at least one linked doc — bounded by the
    // store's partition count (thousands), not its row count; the
    // boolean linksAnyTag scan keeps this pass rewrite-free
    val hit = store
      .filter(TF.linksAnyTag(col(pseudoCol), tags))
      .select(col("_batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    if (hit.isEmpty) return Seq.empty
    // stage the rewritten partitions OUTSIDE the store (a dynamic
    // overwrite reading its own target lazily would race the delete),
    // then swap each partition dir into place
    val staging = storePath + "_rtbf_staging"
    val fs = new org.apache.hadoop.fs.Path(storePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    store.filter(col("_batch_id").isin(hit: _*))
      .withColumn(pseudoCol, TF.forgetTags(col(pseudoCol), tags, replacement))
      .write.mode("overwrite").partitionBy("_batch_id").parquet(staging)
    hit.foreach { b =>
      val live = new org.apache.hadoop.fs.Path(storePath, s"_batch_id=$b")
      val staged = new org.apache.hadoop.fs.Path(staging, s"_batch_id=$b")
      fs.delete(live, true)
      fs.rename(staged, live)
    }
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    hit
  }

  /** Settle a leftover `_rtbf_staging` directory from a crashed run —
    * see [[applyLedgerToStore]]'s crash-safety doc. Exposed for the
    * crash-window tests. */
  private[graft] def recoverStaging(spark: SparkSession,
                                    storePath: String): Unit = {
    val staging = new org.apache.hadoop.fs.Path(storePath + "_rtbf_staging")
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(staging)) return
    if (!fs.exists(new org.apache.hadoop.fs.Path(staging, "_SUCCESS"))) {
      fs.delete(staging, true) // mid-write crash: live store untouched
      return
    }
    fs.listStatus(staging)
      .filter(_.getPath.getName.startsWith("_batch_id="))
      .foreach { st =>
        val live = new org.apache.hadoop.fs.Path(storePath, st.getPath.getName)
        fs.delete(live, true)
        fs.rename(st.getPath, live)
      }
    fs.delete(staging, true)
  }
}

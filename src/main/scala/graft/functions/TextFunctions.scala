package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis surface for large-scale training-data pipelines
 * (SURVEY.md §7.1 M5): tokenization, token counting, quality scoring,
 * language-ID heuristic, fingerprinting, shingling, MinHash.
 *
 * Everything here is built-in Column expressions (codegen'd, no UDFs) so
 * the whole text path stays inside whole-stage codegen at 100 TB; the only
 * custom-Expression ops live in [[Hashing]].
 */
object TextFunctions {

  /** Normalized whitespace tokenization; empty text → empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(lower(trim(text)), "\\s+"))

  /** Token count (whitespace tokenizer). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /**
   * BPE-ish pre-tokenizer count: the GPT-2-style pre-tokenization split
   * simplified to letter runs / digit runs / single non-alnum marks —
   * the cheap proxy for "how many subword tokens will this text cost"
   * used when budgeting LLM training data. Pure regex, identical RE2/Java
   * semantics, so it is oracle-checkable.
   */
  val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(bpePattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /**
   * A small function-word list drawn from the harness corpus vocabulary;
   * used for quality scoring (stopword ratio).
   */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Number of stopword tokens. */
  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), tk => tk.isin(stopwords.map(x => x: Any): _*)))

  /**
   * Quality scoring: length, punctuation density, stopword ratio —
   * the length/punct/stopword heuristics used to filter LLM training
   * text. All ratios are double divisions of exact integer counts, so
   * results are bit-identical across engines.
   */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.!?,;:]", ""))

  def qualityColumns(text: Column): Seq[Column] = {
    val n = tokenCount(text)
    Seq(
      length(text).as("n_chars_calc"),
      n.as("n_tokens"),
      (punctCount(text).cast("double") / greatest(length(text), lit(1))).as("punct_ratio"),
      (stopwordCount(text).cast("double") / greatest(n, lit(1))).as("stopword_ratio"),
      (size(array_distinct(tokens(text))).cast("double") / greatest(n, lit(1))).as("ttr"))
  }

  /**
   * Language-ID heuristic: marker-word votes per language, deterministic
   * argmax (tie → priority order en,de,fr,es). A real system would use
   * char-n-gram profiles; the contract here is a deterministic,
   * SQL-expressible scoring so the oracle can replicate it exactly.
   */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "und", "die"),
    "fr" -> Seq("le", "et", "la"),
    "es" -> Seq("el", "y", "los"))

  def langVote(text: Column, lang: String): Column =
    size(filter(tokens(text), tk => tk.isin(langMarkers(lang).map(x => x: Any): _*)))

  def langId(text: Column): Column = {
    val en = langVote(text, "en"); val de = langVote(text, "de")
    val fr = langVote(text, "fr"); val es = langVote(text, "es")
    val mx = greatest(en, de, fr, es)
    when(mx === 0, lit("und"))
      .when(en === mx, lit("en"))
      .when(de === mx, lit("de"))
      .when(fr === mx, lit("fr"))
      .otherwise(lit("es"))
  }

  /**
   * Document fingerprint: md5 over whitespace-normalized lowercase text.
   * Identical in DuckDB (`md5(...)`), so exact-dup detection by
   * fingerprint is oracle-checkable.
   */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))

  /** Email/phone patterns for [[redactPii]], shared with the DuckDB oracle:
    * restricted to RE2-compatible character classes (no lookaround, no
    * backreferences) so the identical pattern string behaves the same
    * under Java regex (Spark) and RE2 (DuckDB `regexp_replace(..., 'g')`). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}"

  /**
   * PII redaction for training corpora: emails then phone-shaped numbers
   * replaced with stable placeholder tags (emails first, so digits inside
   * an address can't be half-matched as a phone). Pure codegen'd
   * `regexp_replace` — no UDF, no shuffle, linear scan per row.
   */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  /** Remaining audit-tier PII patterns ([[scrubPii]] / NorthStar t35):
    * IPv4 literals and SSN-shaped ID tokens. Same RE2-safe discipline as
    * [[emailPattern]]. For identifiers standing as their own tokens the
    * four classes are mutually non-overlapping — phones are
    * dash-separated 1-3/3/4 digit groups, IDs 3/2/4 (no digit window
    * satisfies both), IPs dot-separated, email TLDs are letters — so
    * token-level detection counts are independent of evaluation order.
    * The one overlap that EXISTS: [[emailPattern]]'s local part admits
    * digits/dots/dashes, so a phone- or IP-shaped span EMBEDDED in an
    * email address (`+1-555-0100@x.com`, `10.0.0.1@x.com`) counts in
    * both classes under raw-text [[piiCount]] — a datasheet built from
    * the counts over-reports those classes by the embedded cases.
    * [[scrubPii]]/[[pseudonymizePii]] are unaffected (the email pass
    * runs first and consumes the whole address), and both engines count
    * identically either way (the oracle contract). */
  val ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val idPattern = "[0-9]{3}-[0-9]{2}-[0-9]{4}"

  /** The audit patterns in scrub order with their placeholder tags:
    * emails first (digits inside an address must not half-match as a
    * phone/IP), then phones, IPs, ID tokens. Tags carry no digits, dots,
    * or dashes, so a replacement can never CREATE a later match. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "EMAIL" -> emailPattern, "PHONE" -> phonePattern,
    "IP" -> ipv4Pattern, "ID" -> idPattern)

  /** Per-pattern PII match count — the detection side of the audit
    * (what a corpus datasheet reports before scrubbing). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Four-class redaction: [[redactPii]] extended with IP/ID tags, in
    * [[piiPatterns]] order. Still a chain of codegen'd `regexp_replace`
    * — map-only at any scale. Dedup MUST fingerprint THIS form, not
    * [[pseudonymizePii]]'s (blind tags collapse volatile per-crawl PII;
    * keyed tags preserve value distinctions by design — see the
    * d25_scrub_dedup witness). */
  def scrubPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (t, (tag, p)) =>
      regexp_replace(t, p, s"<$tag>")
    }

  /**
   * Keyed pseudonymization: each email/phone match is replaced by a
   * stable tag `<EMAIL:n>` / `<PHONE:n>` where n is the unsigned decimal
   * FNV-1a-64 of `key || '|' || match`. Unlike [[scrubPii]]'s blind
   * placeholders, equal identifiers map to equal tags ACROSS documents —
   * linkage (who-talks-to-whom, address frequency) survives scrubbing —
   * while the raw value is unrecoverable without the key.
   *
   * Per row: extract the distinct matches, order them canonically
   * ((length, value) ascending — replacement is a literal fold, so
   * matches in substring relation would make the fold order observable;
   * pinning it keeps the result deterministic and oracle-reproducible),
   * then fold `replace` over the row's own text. Built-ins plus the
   * codegen'd FnvChecksum expression only; per-row cost is
   * O(matches × length) with matches-per-document small, and nothing
   * shuffles. Tags are digits-only between ':' and '>', so a
   * replacement can never create a new email/phone match.
   */
  def pseudonymizePii(text: Column, key: String,
                      classes: Seq[(String, String)] =
                        Seq("EMAIL" -> emailPattern,
                            "PHONE" -> phonePattern)): Column = {
    def tag(label: String, m: Column): Column =
      concat(lit(s"<$label:"),
        conv(hex(Hashing.fnvChecksum(
          concat(lit(key + "|"), m).cast("binary"))), 16, 10),
        lit(">"))
    def sub(t: Column, label: String, pattern: String): Column = {
      val ms = array_sort(
        array_distinct(regexp_extract_all(t, lit(pattern), lit(0))),
        (l, r) => when(length(l) < length(r), -1)
          .when(length(l) > length(r), 1)
          .when(l < r, -1).when(l > r, 1).otherwise(0))
      aggregate(ms, t, (acc, m) =>
        call_function("replace", acc, m, tag(label, m)))
    }
    // default = the linkable identifiers (emails/phones — t36's oracle
    // contract); pass piiPatterns to pseudonymize all four classes
    // (telemetry pipelines keying on visitor IPs). Class order matters
    // the same way scrub order does: emails first, so a phone/IP span
    // embedded in a local part is consumed by the email's tag.
    classes.foldLeft(text) { case (t, (label, p)) => sub(t, label, p) }
  }

  /**
   * Word n-gram shingles (distinct) from a pre-tokenized array column —
   * the unit for Jaccard/MinHash. Documents shorter than n tokens
   * collapse to one whole-text shingle.
   *
   * IMPORTANT for cost: pass a MATERIALIZED token column (projected and
   * cached/shuffled beforehand), not an inline `tokens(text)` expression.
   * Lambda-captured expressions re-evaluate per lambda invocation, so an
   * inline tokenizer would re-run the regex split once per shingle
   * position (~50× per document).
   */
  def shinglesFromTokens(tks: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    column(WordShingles(expression(tks), n))
  }

  /** Shingles straight from text — convenience form; see the cost note on
    * [[shinglesFromTokens]] (prefer the two-step tokenize-then-shingle). */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromTokens(tokens(text), n)

  /**
   * Base hash per shingle: one xxhash64 over the shingle string. Computed
   * ONCE per shingle and materialized as its own column (persist/cache the
   * projection!) so the k minhash functions below derive from cheap
   * long-hashes instead of re-hashing the string k times.
   */
  def shingleHashes(shingleCol: Column): Column =
    transform(shingleCol, sh => xxhash64(sh))

  /**
   * MinHash signature from pre-hashed shingles: k independent functions
   * h_j(x) = xxhash64(x, j) over the base long hash; signature[j] = min
   * over shingles. Single-pass custom expression ([[MinHashSignature]]):
   * value-identical to the builtin-HOF formulation but ~10× cheaper (no
   * k×|h0| interpreted closure calls per row).
   */
  def minhashFromHashes(h0: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    column(MinHashSignature(expression(h0), k))
  }

  /** MinHash signature straight from shingle strings (convenience form —
    * prefer shingleHashes + minhashFromHashes with a cached h0 column). */
  def minhashSignature(shingleCol: Column, k: Int = 64): Column =
    minhashFromHashes(shingleHashes(shingleCol), k)

  /**
   * LSH band hashes: split the k-length signature into `bands` bands of
   * k/bands rows, hash each band. Candidate pairs = documents sharing any
   * (band index, band hash) bucket — the scale path for near-dup joins:
   * a shuffle on band hash replaces the O(n²) pair comparison.
   */
  def lshBandHashes(signature: Column, k: Int = 64, bands: Int = 32): Column = {
    val r = k / bands
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(slice(signature, b * r + 1, lit(r)), b))
  }

  /** Exact Jaccard between two pre-deduplicated shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = (size(a) + size(b)).cast("double") - size(array_intersect(a, b))
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }
}

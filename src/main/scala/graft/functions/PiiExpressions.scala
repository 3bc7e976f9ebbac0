package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused kernels for the guarded PII classes (and the checksum-gated
 * CARD class). Two declarative formulations proved value-correct but
 * evaluation-hostile:
 *
 *  - the CARD higher-order-function tree (ArrayFilter running a
 *    per-digit aggregate Luhn fold, ArraySort + ArrayAggregate literal
 *    fold): every HOF is a CodegenFallback, so the whole upstream
 *    scrub chain re-evaluated INTERPRETED inside it — ~100× the
 *    five-class t35 cost, 15+ CPU-hours at the wave9 100× corpus;
 *  - the guarded two-pass count/scrub chains (three regex scans per
 *    class per row for counts, two for scrub, compounded by
 *    per-expression evaluation overhead): measured 846 s for the
 *    full t35 audit over the 505k-row wave9 corpus.
 *
 * Each kernel here is at most two compiled-regex passes per row —
 * pass 2 runs ONLY when pass 1 found a candidate (the alternate-block
 * recovery is definitionally empty otherwise), which is one scan for
 * the typical corpus row — plus primitive integer Luhn, all
 * `doGenCode`-wired so the surrounding projection stays in whole-stage
 * codegen (the Hashing.scala pattern). Every kernel is VALUE-IDENTICAL
 * to its declarative twin — PiiSpec pins the equivalence laws, and the
 * DuckDB oracle twins are untouched.
 */
object Luhn {
  /** Check-digit test over a candidate with '-'/' ' separators: from
    * the right, every second digit doubled (−9 when > 9), sum ≡ 0
    * mod 10. Pure integer arithmetic — the DuckDB twin
    * (NorthStar.luhnCondSql) replays it digit-for-digit. */
  def valid(s: UTF8String): Boolean = {
    val bytes = s.getBytes
    var sum = 0
    var parity = 0 // 0 = rightmost digit position (undoubled)
    var i = bytes.length - 1
    while (i >= 0) {
      val b = bytes(i)
      if (b >= '0' && b <= '9') {
        var d = b - '0'
        if (parity == 1) { d *= 2; if (d > 9) d -= 9 }
        sum += d
        parity ^= 1
      }
      i -= 1
    }
    sum % 10 == 0
  }
}

/**
 * All of one guarded class's identifier values in `child`, in two-pass
 * extraction order: pass-1 guarded matches (group 2 — the core), then
 * the alternate-blocked survivors recovered from the once-replaced
 * text (TextFunctions' guard-consumption note). Value-identical to
 * `concat(regexp_extract_all(t, p, 2), regexp_extract_all(
 * regexp_replace(t, p, "$1<TAG>$3"), p, 2))`: the once-replaced text
 * is built manually from the pass-1 match spans (guards re-emitted)
 * instead of a second replace scan, and skipped entirely when pass 1
 * found nothing. The checksum-gated CARD class does NOT use this —
 * its candidates come from [[CardRuns]]' run enumeration, which is
 * exact under guard-sharing adjacency.
 */
case class GuardedMatches(child: Expression, pattern: String,
                          unblockTag: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "guarded_matches"

  @transient private lazy val regex = java.util.regex.Pattern.compile(pattern)
  @transient private lazy val empty = new GenericArrayData(new Array[AnyRef](0))

  def compute(input: UTF8String): GenericArrayData = {
    val text = input.toString
    val m = regex.matcher(text)
    if (!m.find()) return empty
    val out = new java.util.ArrayList[UTF8String](4)
    val sb = new java.lang.StringBuilder(text.length)
    var last = 0
    do {
      out.add(UTF8String.fromString(m.group(2)))
      sb.append(text, last, m.start)
        .append(m.group(1)).append(unblockTag).append(m.group(3))
      last = m.end()
    } while (m.find())
    sb.append(text, last, text.length)
    val m2 = regex.matcher(sb)
    while (m2.find()) out.add(UTF8String.fromString(m2.group(2)))
    val arr = new Array[AnyRef](out.size())
    var i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("guardedMatchesExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): GuardedMatches =
    copy(child = newChild)
}

/**
 * One guarded class's full scrub: the exact two-pass
 * `regexp_replace(regexp_replace(t, p, "$1TAG$3"), p, "$1TAG$3")`
 * semantics (pass 2 catches alternate-blocked spans), built manually
 * from match spans with guards re-emitted — and pass 2 (and the
 * string copy) skipped when a pass finds nothing: the typical corpus
 * row costs ONE scan and returns the input buffer untouched.
 */
case class GuardedScrub(child: Expression, pattern: String,
                        tag: String) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "guarded_scrub"

  @transient private lazy val regex = java.util.regex.Pattern.compile(pattern)

  /** One replace pass; null when the pass matched nothing. */
  private def passReplace(text: String): String = {
    val m = regex.matcher(text)
    if (!m.find()) return null
    val sb = new java.lang.StringBuilder(text.length)
    var last = 0
    do {
      sb.append(text, last, m.start)
        .append(m.group(1)).append(tag).append(m.group(3))
      last = m.end()
    } while (m.find())
    sb.append(text, last, text.length)
    sb.toString
  }

  def compute(input: UTF8String): UTF8String = {
    val once = passReplace(input.toString)
    if (once == null) return input
    val twice = passReplace(once)
    UTF8String.fromString(if (twice == null) once else twice)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("guardedScrubExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): GuardedScrub =
    copy(child = newChild)
}

/**
 * Run-enumeration CARD detection — the exact replacement for the
 * consuming-regex candidate scan, whose leftmost-first consumption
 * could let a space-separated digit neighbor steal a spaced PAN's head
 * (the round-15 law-pinned under-count). Semantics, replayed
 * digit-for-digit by the DuckDB twin (NorthStar.cardValuesSql):
 *
 *  1. MAXIMAL digit-group runs: digit groups joined by single dash or
 *     space separators (a separator not followed by a digit ends the
 *     run). Runs cannot overlap, so enumerating them is scan-order
 *     exact.
 *  2. Within a run, CANDIDATES are the group-aligned card shapes —
 *     A: lens (4,4,4,1–7); B (Amex): lens (4,6,5); C: one contiguous
 *     13–19-digit group — whose boundary guards hold as CONTEXT
 *     (non-consuming, so neighbors can never block a lead):
 *     an interior candidate's lead/tail separator must be a SPACE
 *     (dash-adjacency rejected, as before); a run-edge candidate needs
 *     the run's own lead char outside [0-9A-Za-z.+-] (or start) and
 *     tail char outside [0-9A-Za-z-] with '.' admitted only before a
 *     non-digit (tailNum's \\.[^0-9] / \\.$ arms; or end).
 *  3. Selection is GREEDY LEFTMOST-VALID with shape priority A,B,C at
 *     equal start: scan group indices left to right, take the first
 *     Luhn-valid candidate, jump past it, continue. Invalid candidates
 *     never consume anything — that is the exactness fix — and when
 *     two VALID candidates overlap, the leftmost wins (law-pinned
 *     arbitration; deterministic and engine-identical).
 *
 * A pure char-level scan: no regex at all, O(len + runs·shapes) per
 * row, and the Luhn fold runs on the text buffer in place.
 */
object CardRuns {
  @inline private def isDigit(c: Char) = c >= '0' && c <= '9'
  @inline private def isAlnum(c: Char) =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  /** Luhn check over text[from, to) with separators skipped in place. */
  def luhnOk(text: String, from: Int, to: Int): Boolean = {
    var sum = 0
    var parity = 0
    var i = to - 1
    while (i >= from) {
      val c = text.charAt(i)
      if (isDigit(c)) {
        var d = c - '0'
        if (parity == 1) { d *= 2; if (d > 9) d -= 9 }
        sum += d
        parity ^= 1
      }
      i -= 1
    }
    sum % 10 == 0
  }

  /** The selected verified card values of `text`, in text order; null
    * when there are none (the common row — no allocation at all). */
  def selectedValues(text: String): java.util.ArrayList[String] = {
    var out: java.util.ArrayList[String] = null
    val n = text.length
    val gStart = new scala.collection.mutable.ArrayBuffer[Int](8)
    val gEnd = new scala.collection.mutable.ArrayBuffer[Int](8)
    var pos = 0
    while (pos < n) {
      if (!isDigit(text.charAt(pos))) pos += 1
      else {
        val runStart = pos
        gStart.clear(); gEnd.clear()
        var cont = true
        while (cont) {
          val s0 = pos
          while (pos < n && isDigit(text.charAt(pos))) pos += 1
          gStart += s0; gEnd += pos
          cont = pos + 1 < n &&
            (text.charAt(pos) == '-' || text.charAt(pos) == ' ') &&
            isDigit(text.charAt(pos + 1))
          if (cont) pos += 1
        }
        val runEnd = pos
        val m = gStart.length
        val leadOkRun = runStart == 0 || {
          val c = text.charAt(runStart - 1)
          !(isAlnum(c) || c == '.' || c == '+' || c == '-')
        }
        val tailOkRun = runEnd == n || {
          val c = text.charAt(runEnd)
          if (c == '.') runEnd + 1 == n || !isDigit(text.charAt(runEnd + 1))
          else !(isAlnum(c) || c == '-')
        }
        def gl(i: Int) = gEnd(i) - gStart(i)
        def leadOk(i: Int) =
          if (i == 0) leadOkRun else text.charAt(gStart(i) - 1) == ' '
        def tailOk(j: Int) =
          if (j == m - 1) tailOkRun else text.charAt(gEnd(j)) == ' '
        var gi = 0
        while (gi < m) {
          var end = -1
          if (gi + 3 < m && gl(gi) == 4 && gl(gi + 1) == 4 &&
              gl(gi + 2) == 4 && gl(gi + 3) >= 1 && gl(gi + 3) <= 7 &&
              leadOk(gi) && tailOk(gi + 3) &&
              luhnOk(text, gStart(gi), gEnd(gi + 3))) end = gi + 3
          else if (gi + 2 < m && gl(gi) == 4 && gl(gi + 1) == 6 &&
              gl(gi + 2) == 5 && leadOk(gi) && tailOk(gi + 2) &&
              luhnOk(text, gStart(gi), gEnd(gi + 2))) end = gi + 2
          else if (gl(gi) >= 13 && gl(gi) <= 19 && leadOk(gi) && tailOk(gi) &&
              luhnOk(text, gStart(gi), gEnd(gi))) end = gi
          if (end >= 0) {
            if (out == null) out = new java.util.ArrayList[String](2)
            out.add(text.substring(gStart(gi), gEnd(end)))
            gi = end + 1
          } else gi += 1
        }
      }
    }
    out
  }
}

/** The CARD class's verified values as an array column — [[CardRuns]]'
  * run-enumeration semantics (exact counts under any adjacency). */
case class CardMatches(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "card_matches"

  @transient private lazy val empty = new GenericArrayData(new Array[AnyRef](0))

  def compute(input: UTF8String): GenericArrayData = {
    val vals = CardRuns.selectedValues(input.toString)
    if (vals == null) return empty
    val arr = new Array[AnyRef](vals.size())
    var i = 0
    while (i < arr.length) { arr(i) = UTF8String.fromString(vals.get(i)); i += 1 }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cardMatchesExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CardMatches =
    copy(child = newChild)
}

/**
 * The CARD class's scrub: replace every [[CardRuns]]-verified card
 * value with `tag` by a literal fold over the DISTINCT verified values
 * in the pinned length-DESC / value-ASC order (TextFunctions'
 * pseudonymize order — containers before contained values, ties
 * cross-engine; the comparator is on chars, exact for these ASCII
 * values). Regex alone cannot express the checksum gate, so this is
 * fold semantics, not two-pass-replace semantics; the DuckDB twin is
 * NorthStar.pseudoSql over cardValuesSql with a constant tag. Literal
 * folding is position-blind by contract: a verified value occurring
 * inside a longer unguarded run is rewritten there too (the
 * conservative side for redaction).
 */
case class CardScrub(child: Expression, tag: String) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "card_scrub"

  def compute(input: UTF8String): UTF8String = {
    val text = input.toString
    val vals = CardRuns.selectedValues(text)
    if (vals == null) return input
    val set = new java.util.TreeSet[String](new java.util.Comparator[String] {
      override def compare(l: String, r: String): Int = {
        val byLen = java.lang.Integer.compare(r.length, l.length)
        if (byLen != 0) byLen else l.compareTo(r)
      }
    })
    set.addAll(vals)
    var acc = text
    val it = set.iterator()
    while (it.hasNext) acc = acc.replace(it.next(), tag)
    UTF8String.fromString(acc)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cardScrubExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CardScrub =
    copy(child = newChild)
}

/**
 * Batch right-to-be-forgotten: replace every occurrence of any tag in
 * `tags` with `replacement` in ONE scan, regardless of ledger size —
 * the multi-request form of the single-tag literal replace in
 * TextFunctions.forgetValue / forgetValueMac.
 *
 * Completeness argument for the single scan: every tag is a complete
 * `<...>` span containing neither bracket internally (enforced below —
 * TF.pseudoTag / pseudoTagMac outputs are `<LABEL:digits>` /
 * `<LABEL#hex>` by construction), so a tag occurrence in the text
 * always runs from a '<' to the FIRST '>' after it; probing exactly
 * that substring against a hash set per '<' finds every occurrence of
 * every tag. Value-identical to folding the per-tag literal replaces
 * in ANY order: distinct tag occurrences cannot overlap (both are
 * '<'-anchored full spans — same start would force the same first-'>'
 * substring) and the replacement carries no tag, so the fold is
 * confluent — RtbfSpec pins batch == sequential-fold as a law.
 * O(len + occurrences) per row, ledger-size-independent: the 100 TB
 * shape is a broadcast hash set riding a map-only scan, not one
 * corpus pass per deletion request.
 */
case class ForgetTags(child: Expression, tags: Seq[String],
                      replacement: String) extends UnaryExpression {
  require(tags.forall(t => t.length >= 3 && t.head == '<' && t.last == '>' &&
      !t.substring(1, t.length - 1).exists(c => c == '<' || c == '>')),
    "every RTBF tag must be a complete <...> span with no interior bracket")

  override def dataType: DataType = StringType
  override def prettyName: String = "forget_tags"

  @transient private lazy val tagSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(16, tags.size * 2))
    tags.foreach(s.add)
    s
  }
  @transient private lazy val maxTagLen: Int =
    if (tags.isEmpty) 0 else tags.iterator.map(_.length).max

  def compute(input: UTF8String): UTF8String = {
    if (tags.isEmpty) return input
    val text = input.toString
    var i = text.indexOf('<')
    if (i < 0) return input
    var sb: java.lang.StringBuilder = null
    var last = 0
    while (i >= 0) {
      val j = text.indexOf('>', i + 1)
      if (j < 0) i = -1 // no further span can close — done
      else if (j - i < maxTagLen && tagSet.contains(text.substring(i, j + 1))) {
        if (sb == null) sb = new java.lang.StringBuilder(text.length)
        sb.append(text, last, i).append(replacement)
        last = j + 1
        i = text.indexOf('<', j + 1)
      } else i = text.indexOf('<', i + 1)
    }
    if (sb == null) input
    else {
      sb.append(text, last, text.length)
      UTF8String.fromString(sb.toString)
    }
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("forgetTagsExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ForgetTags =
    copy(child = newChild)
}

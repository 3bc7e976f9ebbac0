package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused kernels for the checksum-gated CARD PII class. The declarative
 * formulation (two `regexp_extract_all` passes concat'd, an
 * `ArrayFilter` running a per-digit `aggregate` Luhn fold, and an
 * `ArraySort` + `ArrayAggregate` literal-replace fold) is
 * value-correct but evaluation-hostile: every higher-order function is
 * a CodegenFallback, so the WHOLE upstream scrub chain re-evaluates
 * interpreted inside the HOF tree — measured ~100× the five-class t35
 * cost at sf0.1 and 15+ CPU-hours at the wave9 100× corpus before
 * these kernels replaced it. Each expression here is one compiled-regex
 * pass plus primitive integer loops, `doGenCode`-wired so the
 * surrounding projection stays in whole-stage codegen (the Hashing.scala
 * pattern), and is VALUE-IDENTICAL to the HOF formulation —
 * PiiSpec pins the equivalence law.
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
 * All Luhn-VERIFIED card values in `child`, in two-pass extraction
 * order (pass-1 guarded matches, then the alternate-blocked survivors
 * recovered from the once-replaced text — TextFunctions' guard note).
 * Value-identical to
 * `filter(classMatches(t, CARD), luhnValid)`: the unblocking replace
 * rewrites ALL candidates (validity does not matter for recovering a
 * consumed lead char) with the class tag re-emitting guards, exactly
 * like `regexp_replace(t, pattern, "$1<CARD>$3")`.
 */
case class LuhnCandidates(child: Expression, pattern: String,
                          unblockTag: String) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "luhn_candidates"

  @transient private lazy val regex = java.util.regex.Pattern.compile(pattern)
  @transient private lazy val repl =
    java.util.regex.Matcher.quoteReplacement(unblockTag)

  private def collect(text: String, out: java.util.ArrayList[UTF8String]): Unit = {
    val m = regex.matcher(text)
    while (m.find()) {
      val v = UTF8String.fromString(m.group(2))
      if (Luhn.valid(v)) out.add(v)
    }
  }

  def compute(input: UTF8String): GenericArrayData = {
    val text = input.toString
    val out = new java.util.ArrayList[UTF8String](4)
    collect(text, out)
    // pass 2 over the once-replaced text — "$1<TAG>$3" re-emits guards
    val once = regex.matcher(text).replaceAll("$1" + repl + "$3")
    if (once != text) collect(once, out)
    val arr = new Array[AnyRef](out.size())
    var i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    new GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("luhnCandExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): LuhnCandidates =
    copy(child = newChild)
}

/**
 * The CARD class's scrub: replace every Luhn-verified card value with
 * `tag` by a literal fold over the DISTINCT verified values in the
 * pinned length-DESC / value-ASC order (TextFunctions' pseudonymize
 * order — containers before contained values, ties cross-engine).
 * Value-identical to
 * `foldReplace(t, LuhnCandidates(t), _ => lit(tag))`; the DuckDB twin
 * is NorthStar.pseudoSql with a constant tag. Literal folding is
 * position-blind by contract: a verified value occurring inside a
 * longer unguarded run is rewritten there too (the conservative side
 * for redaction).
 */
case class LuhnScrub(child: Expression, pattern: String,
                     tag: String) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "luhn_scrub"

  @transient private lazy val candidates = LuhnCandidates(child, pattern, tag)

  def compute(input: UTF8String): UTF8String = {
    val vals = candidates.compute(input)
    val n = vals.numElements()
    if (n == 0) return input
    val set = new java.util.TreeSet[UTF8String](
      new java.util.Comparator[UTF8String] {
        override def compare(l: UTF8String, r: UTF8String): Int = {
          val byLen = java.lang.Integer.compare(r.numBytes(), l.numBytes())
          if (byLen != 0) byLen else l.compareTo(r)
        }
      })
    var i = 0
    while (i < n) { set.add(vals.getUTF8String(i)); i += 1 }
    var acc = input.toString
    val it = set.iterator()
    while (it.hasNext) acc = acc.replace(it.next().toString, tag)
    UTF8String.fromString(acc)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("luhnScrubExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): LuhnScrub =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Luhn-checksum card-number detection (Luhn, US patent 2,950,048 —
  * the mod-10 checksum every payment-card PAN carries). The regex
  * PII family ([[Text.redactPii]]) can only pattern-match; a digit
  * run is NOT a card number unless its checksum holds, and redacting
  * every 16-digit run would destroy order ids, EANs, and timestamps.
  * This family VALIDATES before it redacts — the difference between
  * a PII scrubber and a digit shredder.
  *
  * Candidate grammar (identical in Java regex and RE2, so the DuckDB
  * oracle replays it verbatim): a maximal run
  * `[0-9](?:[ -]?[0-9])*` — digits joined by at most ONE space or
  * dash between neighbors (the ways humans typeset PANs). A run is a
  * CANDIDATE iff its digit count is 13..19 (ISO/IEC 7812 PAN
  * lengths); maximal-run semantics mean an over-long run is rejected
  * whole, never re-segmented (deterministic, and what the SQL twin's
  * regexp_extract_all does). A candidate is VALID iff Luhn holds:
  * from the right, double every second digit, fold >9 by −9, sum
  * ≡ 0 (mod 10).
  */
object LuhnImpl {
  private val Run =
    java.util.regex.Pattern.compile("[0-9](?:[ -]?[0-9])*")

  /** Luhn mod-10 over an ASCII digit string. */
  def luhnOk(digits: String): Boolean = {
    var sum = 0
    var alt = false
    var i = digits.length - 1
    while (i >= 0) {
      var v = digits.charAt(i) - '0'
      if (alt) { v *= 2; if (v > 9) v -= 9 }
      sum += v
      alt = !alt
      i -= 1
    }
    sum % 10 == 0
  }

  private def strip(run: String): String = {
    val b = new java.lang.StringBuilder(run.length)
    var i = 0
    while (i < run.length) {
      val c = run.charAt(i)
      if (c >= '0' && c <= '9') b.append(c)
      i += 1
    }
    b.toString
  }

  /** Count of 13–19-digit candidate runs. */
  def candidateCount(t: UTF8String): Int = {
    val m = Run.matcher(t.toString)
    var n = 0
    while (m.find()) {
      val d = strip(m.group()).length
      if (d >= 13 && d <= 19) n += 1
    }
    n
  }

  /** Count of candidate runs whose Luhn checksum holds. */
  def validCount(t: UTF8String): Int = {
    val m = Run.matcher(t.toString)
    var n = 0
    while (m.find()) {
      val d = strip(m.group())
      if (d.length >= 13 && d.length <= 19 && luhnOk(d)) n += 1
    }
    n
  }

  /** Replace each Luhn-VALID candidate with `<CARD>`; invalid runs
    * and non-candidates pass through untouched. */
  def redact(t: UTF8String): UTF8String = {
    val s = t.toString
    val m = Run.matcher(s)
    val out = new java.lang.StringBuilder(s.length)
    var last = 0
    while (m.find()) {
      val d = strip(m.group())
      if (d.length >= 13 && d.length <= 19 && luhnOk(d)) {
        out.append(s, last, m.start()).append("<CARD>")
        last = m.end()
      }
    }
    out.append(s, last, s.length)
    UTF8String.fromString(out.toString)
  }
}

/** Shared typecheck/codegen scaffold for the unary Luhn expressions
  * (the [[JaroWinkler]] discipline: a static call inside the
  * codegen'd stage — no UDF boxing, inline null handling). */
sealed trait LuhnUnary extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")
  protected def staticCall: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LuhnImpl.$staticCall($c)")
}

/** Candidate PAN-shaped runs (13–19 digits) in a string column. */
case class LuhnCandidateCount(child: Expression) extends LuhnUnary {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_luhn_candidates"
  override protected def staticCall: String = "candidateCount"
  override def nullSafeEval(a: Any): Any =
    LuhnImpl.candidateCount(a.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): LuhnCandidateCount =
    copy(child = c)
}

/** Luhn-valid card numbers in a string column. */
case class LuhnValidCount(child: Expression) extends LuhnUnary {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_luhn_valid"
  override protected def staticCall: String = "validCount"
  override def nullSafeEval(a: Any): Any =
    LuhnImpl.validCount(a.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): LuhnValidCount =
    copy(child = c)
}

/** Text with every Luhn-valid card number replaced by `<CARD>`. */
case class LuhnRedact(child: Expression) extends LuhnUnary {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_luhn_redact"
  override protected def staticCall: String = "redact"
  override def nullSafeEval(a: Any): Any =
    LuhnImpl.redact(a.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): LuhnRedact =
    copy(child = c)
}

/** Column-level entry points for checksum-validated PII detection. */
object Pii {
  /** Count of PAN-shaped digit runs (13–19 digits, space/dash
    * separated) — the false-positive surface a regex-only scrubber
    * would have redacted. */
  def cardCandidates(text: Column): Column =
    GraftSqlBridge.column(LuhnCandidateCount(GraftSqlBridge.expression(text)))

  /** Count of Luhn-VALID card numbers. */
  def cardsValid(text: Column): Column =
    GraftSqlBridge.column(LuhnValidCount(GraftSqlBridge.expression(text)))

  /** Text with Luhn-valid card numbers replaced by `<CARD>`. */
  def redactCards(text: Column): Column =
    GraftSqlBridge.column(LuhnRedact(GraftSqlBridge.expression(text)))
}

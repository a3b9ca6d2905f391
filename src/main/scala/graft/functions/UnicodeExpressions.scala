package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) — the
  * FIXER behind the mojibake/confusable screens: scraped corpora mix
  * precomposed code points (U+00E9 é) with decomposed sequences
  * (e + U+0301), which breaks exact dedup, tokenization, and every
  * hash-keyed operator downstream — two visually identical documents
  * hash apart. Normalizing at the ingest door makes byte equality
  * mean string equality.
  *
  * Implementation: `java.text.Normalizer` (the JDK's ICU-derived
  * tables) behind a codegen'd static call — no UDF boxing. The
  * DuckDB twin replays with utf8proc's `nfc_normalize`: two
  * INDEPENDENT Unicode implementations agreeing byte-for-byte is the
  * cross-engine gate. Fast path: `isNormalized` is O(n) with no
  * allocation for already-NFC text (the overwhelmingly common case —
  * ASCII short-circuits), so the scan cost is a check, not a rewrite.
  */
object NfcImpl {
  def nfc(t: UTF8String): UTF8String = {
    val s = t.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) t
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}

/** Native Catalyst NFC normalizer over a string column. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc_normalize"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")
  override def nullSafeEval(a: Any): Any =
    NfcImpl.nfc(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcImpl.nfc($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

/** Column-level entry point. */
object Unicode {
  /** NFC-normalize a string column (null passes through). */
  def nfc(text: Column): Column =
    GraftSqlBridge.column(NfcNormalize(GraftSqlBridge.expression(text)))
}

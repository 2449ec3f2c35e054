package graft.functions

import java.text.Normalizer
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `normalize_text(s)` — the canonical first pass of a text-ingest
  * pipeline, as one codegen'd expression: Unicode NFC composition (so
  * "e" + U+0301 and precomposed U+00E9 hash/dedup/shingle identically),
  * whitespace-run collapse to a single space, control/zero-width-character
  * strip, and edge trim. Crawled corpora arrive with all four problems;
  * doing this before any dedup/quality operator makes their digests
  * canonical.
  *
  * The pipeline is a FIXED, engine-portable recipe (each step mirrors a
  * DuckDB-expressible form, so queries using it stay hash-oracled):
  *   1. NFC (java.text.Normalizer and DuckDB `nfc_normalize` both
  *      implement UAX #15 — identical output on valid input);
  *   2. `[ \t\n\f\r]+` to one space (explicit ASCII whitespace class —
  *      identical in Java regex and RE2);
  *   3. strip `[\x00-\x08\x0E-\x1F\x7F-\x9F\u200B\uFEFF]` (C0 remnants,
  *      C1 controls, zero-width space, BOM);
  *   4. trim leading/trailing spaces.
  *
  * Spark has no normalization built-in (as of 4.x), so this is the
  * (b)-tier custom-operator route: a scalar `Expression` whose codegen is
  * one static call, keeping scans that clean text inside whole-stage
  * codegen. Scale: narrow, stateless, zero shuffle.
  */
object NormalizeText {

  private val ws = Pattern.compile("[ \\t\\n\\f\\r]+")
  private val ctl =
    Pattern.compile("[\\x00-\\x08\\x0E-\\x1F\\x7F-\\x9F\\u200B\\uFEFF]")
  private val edge = Pattern.compile("^ +| +$")

  /** Static so codegen emits a single call. */
  def normalize(s: UTF8String): UTF8String = {
    val nfc = Normalizer.normalize(s.toString, Normalizer.Form.NFC)
    val collapsed = ws.matcher(nfc).replaceAll(" ")
    val stripped = ctl.matcher(collapsed).replaceAll("")
    UTF8String.fromString(edge.matcher(stripped).replaceAll(""))
  }
}

case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"normalize_text expects a string, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(s: Any): Any =
    NormalizeText.normalize(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.NormalizeText.normalize($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** `nlz64(x)` — number of leading zero bits of a 64-bit value, as one
  * codegen'd `Long.numberOfLeadingZeros` call (an LZCNT instruction after
  * JIT). The HLL register rank needs "position of the first 1 bit", and
  * the oracle-portable rendering ([[Sketches.hllRegisters]]) computes it
  * with bin/lpad/instr — three string materializations per row, chosen
  * because DuckDB reproduces them exactly. At 100 TB the sketch build is
  * a pure scan whose per-row cost is exactly this rank computation, so
  * the production path ([[Sketches.hllRegistersNative]]) uses this
  * expression instead and is spec-pinned bit-equal to the string form
  * (the same production-vs-oracle split as simHash's xxhash64 vs md5).
  *
  * Spark has no bit-rank built-in (`bit_count` exists, leading-zeros does
  * not, as of 4.x), so this is the (b)-tier custom-operator route: a
  * scalar `Expression` whose codegen is a single static call, staying
  * inside whole-stage codegen.
  */
case class LeadingZeros(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nlz64 expects a bigint, got ${t.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nlz64"

  override def nullSafeEval(x: Any): Any =
    java.lang.Long.numberOfLeadingZeros(x.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Long.numberOfLeadingZeros($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

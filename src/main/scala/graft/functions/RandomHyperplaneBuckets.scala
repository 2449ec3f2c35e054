package graft.functions

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** All random-hyperplane LSH bucket ids for a vector in one fused pass:
  * output[t] = the `bits`-bit signature of table t, where bit b is the sign
  * of the projection onto a deterministic ±1 hyperplane. Plane coefficients
  * derive from MurmurHash3(t, b, d) at construction — identical on every
  * executor and identical to the composable form this replaces
  * (64 interpreted `aggregate(zip_with(...))` dot products per row →
  * one generated loop over `tables × bits × dim` multiply-adds).
  */
case class RandomHyperplaneBuckets(child: Expression, tables: Int, bits: Int, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rhp_buckets expects array<float>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "rhp_buckets"

  /** flattened [tables × bits × dim] ±1 matrix, same sign convention as the
    * composable `Similarity.planes`.
    */
  @transient private lazy val planes: Array[Double] = {
    val m = new Array[Double](tables * bits * dim)
    var t = 0
    while (t < tables) {
      var b = 0
      while (b < bits) {
        var d = 0
        while (d < dim) {
          m(((t * bits) + b) * dim + d) =
            if ((MurmurHash3.productHash((t, b, d)) & 1) == 0) 1.0 else -1.0
          d += 1
        }
        b += 1
      }
      t += 1
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val buckets = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var b = 0
      while (b < bits) {
        val base = ((t * bits) + b) * dim
        var s = 0.0
        var d = 0
        while (d < n) {
          s += planes(base + d) * arr.getFloat(d).toDouble
          d += 1
        }
        bucket = bucket * 2 + (if (s > 0) 1 else 0)
        b += 1
      }
      buckets(t) = bucket
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(buckets)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("planes", planes, "double[]")
      val n = ctx.freshName("n")
      val buckets = ctx.freshName("buckets")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val bucket = ctx.freshName("bucket")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $dim);
         |final int[] $buckets = new int[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $bucket = 0;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    final int $base = (($t * $bits) + $b) * $dim;
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $s += $m[$base + $d] * (double) $a.getFloat($d);
         |    }
         |    $bucket = $bucket * 2 + ($s > 0 ? 1 : 0);
         |  }
         |  $buckets[$t] = $bucket;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($buckets);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

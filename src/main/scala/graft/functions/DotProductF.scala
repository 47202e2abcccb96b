package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the float-vector dot product — the one
  * hot-loop the built-ins can only express as interpreted higher-order
  * folds (`aggregate`/`zip_with` evaluate a lambda per element; at 64 dims ×
  * millions of candidate pairs that's the ANN verify bottleneck).
  *
  * `doGenCode` emits a tight primitive `for` loop over the two ArrayData
  * buffers inside whole-stage codegen — no per-element boxing, no lambda
  * dispatch. The arithmetic is the **same IEEE-754 sequence** as the
  * declarative fold in [[VecFns.dotFold]] (left-to-right: acc +=
  * double(a_i)*double(b_i)), so results — and the DuckDB oracle twins
  * generated from that fold — are bit-identical; DedupSimSpec asserts it.
  *
  * Defined for equal-length arrays with non-null elements (embedding
  * vectors); on length mismatch the shorter length bounds the loop.
  */
case class DotProductF(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<float> inputs, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_f"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

object DotProductF {
  /** Column-API surface. */
  def apply(a: Column, b: Column): Column =
    SqlBridge.column(
      DotProductF(SqlBridge.expression(a), SqlBridge.expression(b)))
}

package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

/** `explode_pairs(array)` — a table-generating (UDTF-class) expression:
  * one input array row fans out into its C(n,2) ordered index pairs
  * `(s1, s2)` with `s1` before `s2` in array order. The generator form of
  * the bipartite-projection idiom ([[graft.engine.Graph.coSupplyEdges]]
  * implements the same fan-out with higher-order-function lambdas; this
  * expression completes the extension-type matrix — scalar `Expression`
  * with `doGenCode`, typed `Aggregator`, optimizer `Rule`, planner
  * `Strategy`/`SparkPlan`, and now a `Generator` — and evaluates the
  * pair loop in one pass with no per-element lambda dispatch).
  *
  * Planned through `GenerateExec` exactly like `explode`/`inline`;
  * interpreted eval (CodegenFallback) — the fan-out loop is allocation-
  * bound, not dispatch-bound, so codegen buys nothing here. */
case class ExplodePairsE(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"explode_pairs expects an array argument, got ${other.simpleString}")
  }

  private lazy val elemType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def elementSchema: StructType = StructType(
    StructField("s1", elemType, nullable = true) ::
      StructField("s2", elemType, nullable = true) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      val out = new ArrayBuffer[InternalRow](math.max(n * (n - 1) / 2, 0))
      var i = 0
      while (i < n) {
        val x = a.get(i, elemType)
        var j = i + 1
        while (j < n) {
          out += InternalRow(x, a.get(j, elemType))
          j += 1
        }
        i += 1
      }
      out
    }
  }

  override def prettyName: String = "explode_pairs"
  override protected def withNewChildInternal(c: Expression): ExplodePairsE =
    copy(child = c)
}

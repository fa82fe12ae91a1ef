package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two `array<double>` columns.
  *
  * Why a custom Expression (SURVEY §7.3 said "built-ins unless justified" —
  * this one is justified by measurement): the higher-order-function
  * formulation `aggregate(zip_with(a, b, *), 0d, +)` is CodegenFallback —
  * interpreted per row, building a zipped intermediate array and boxing
  * through lambda variables. On the blocked near-dup query that cost
  * ~2× wall-clock even after hoisting norms. This expression is a tight
  * codegen'd loop over the unsafe array data: no intermediate allocation,
  * no virtual calls, stays inside WholeStageCodegen.
  *
  * Semantics match the sequential-fold definition exactly (same order of
  * additions → bit-identical doubles vs both the HOF version and DuckDB's
  * list_dot_product on well-formed input). Null ARRAYS propagate null;
  * LENGTH-MISMATCHED arrays yield null — identical to the HOF form, where
  * `zip_with` null-pads the shorter side and `acc + null` poisons the fold
  * (DuckDB's list_dot_product instead errors; the oracled queries only
  * ever dot same-length embeddings, so the engines never diverge). Null
  * ELEMENTS are undefined (embedding columns are element-non-null).
  *
  * The registry builder ([[GraftExtensions]]) casts inputs to
  * `array<double>`, so `array<float>` embedding columns work directly.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_dot requires array<double> inputs, got $l and $r")
    }

  override def dataType: DataType = DoubleType

  // nullable even over non-null children: length mismatch yields null
  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

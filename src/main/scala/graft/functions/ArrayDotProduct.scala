package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd left-fold dot product of two `array<double>` columns.
  *
  * Hot-path replacement for the `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * higher-order formulation: higher-order array functions evaluate their
  * lambda per element through the interpreter (no whole-stage codegen), so
  * on an O(pairs × dims) similarity join they dominate the runtime. This
  * expression emits a plain fused Java loop instead, keeping the whole
  * pair-scoring stage inside WholeStageCodegen.
  *
  * Semantics are IDENTICAL to the higher-order version and to the DuckDB
  * oracle's `list_reduce(list_prepend(0.0, list_transform(...)))`: a left
  * fold seeded at 0.0 in element order — double addition is
  * order-sensitive, and fixing the order keeps every similarity bitwise
  * reproducible across engines and partition layouts.
  *
  * Assumes equal-length arrays (the embedding fixtures guarantee it);
  * extra elements on the longer side are ignored, mirroring `zip_with`'s
  * shorter-side behavior for our use. A null element anywhere yields
  * NULL — the function is registered globally, and `getDouble` on a null
  * slot would otherwise read undefined bits.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double> inputs, got $l and $r")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("sawNull")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |boolean $bad = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; break; }
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd squared-L2 distance over two `array<double>` columns —
  * the PQ assignment hot kernel ([[graft.ops.Similarity.s4PqCodesWith]]):
  * subvector rows × k candidate centroids per subspace.
  *
  * The composed form (`aggregate(zip_with(a,b,(x,y)=>(x-y)*(x-y)), 0.0, _+_)`)
  * routes every element through higher-order-function lambda evaluation,
  * which sits OUTSIDE whole-stage codegen; this expression is one fused
  * double loop inside it. The accumulation is EXACTLY the composed form's
  * sequential left-to-right recurrence (`acc = 0.0; acc += (xᵢ-yᵢ)²` in
  * index order — double addition is NOT associative, so the order is the
  * contract), making the result bit-identical by construction
  * (FunctionsSpec pins it) — swapping implementations cannot move the
  * oracle hash.
  *
  * Mismatched lengths and null ELEMENTS yield null (as the composed
  * form: zip_with's null pad — or a null component — poisons the fold;
  * ArrayData.getDouble would silently read a null slot as 0.0, which is
  * exactly the divergence the null checks below exist to prevent).
  */
case class SqDistDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sq_dist_double expects (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // null on length mismatch
  override def prettyName: String = "sq_dist_double"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistDouble =
    copy(left = newLeft, right = newRight)
}

object SqDistDouble {
  /** Column-API form: `sq_dist_double($"a", $"b")`. */
  def sq_dist_double(a: Column, b: Column): Column =
    Bridge.column(SqDistDouble(Bridge.expr(a), Bridge.expr(b)))
}

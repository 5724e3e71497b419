package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd squared-L2 distance over two `array<long>` columns —
  * the k-means hot kernel ([[graft.ops.Kmeans]]): corpus × k centroid
  * distances per Lloyd's round.
  *
  * The composed form (`aggregate(zip_with(a,b,(x,y)=>(x-y)*(x-y)), 0L, _+_)`)
  * routes every element through higher-order-function lambda evaluation,
  * which sits OUTSIDE whole-stage codegen; this expression is one fused
  * long loop inside it. Long addition is associative, so the result is
  * bit-identical to the composed form by construction (FunctionsSpec
  * pins it) — swapping implementations cannot move the oracle hash.
  *
  * Mismatched lengths and null ELEMENTS yield null (as the composed
  * form: zip_with's null pad — or a null component — poisons the fold;
  * ArrayData.getLong would silently read a null slot as 0, which is
  * exactly the divergence the null checks below exist to prevent).
  * Overflow is NOT ANSI-checked (plain Java long arithmetic): callers
  * feed quantized embeddings whose component deltas are ≤ ~2·10⁶, i.e.
  * ~2⁴² per 64-dim sum — 20 bits of headroom.
  */
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sq_dist_long expects (array<bigint>, array<bigint>), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // null on length mismatch
  override def prettyName: String = "sq_dist_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
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
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistLong =
    copy(left = newLeft, right = newRight)
}

object SqDistLong {
  /** Column-API form: `sq_dist_long($"a", $"b")`. */
  def sq_dist_long(a: Column, b: Column): Column =
    Bridge.column(SqDistLong(Bridge.expr(a), Bridge.expr(b)))
}

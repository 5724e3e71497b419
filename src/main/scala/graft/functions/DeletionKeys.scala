package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd FastSS deletion-neighborhood keys over a string
  * column: `[name] ++ [name minus one character]` for every character
  * position, first-occurrence-deduplicated — the block-key generator of
  * the q62 fuzzy-join family (`graft.ops.FuzzyJoin`).
  *
  * Why native and not the composed `transform(sequence(...), substr ++
  * substr)` form: higher-order functions are CodegenFallback, and —
  * decisively — `InferFiltersFromGenerate` synthesizes a
  * `size(keys) > 0` predicate under the `explode(keys)` these keys
  * always feed, which predicate-pushdown then substitutes through every
  * projection down to the source, INLINING the key construction (and
  * whatever expression derives `name` itself) once more per input row.
  * With the composed form each of its ~2L `name` references re-evaluates
  * the inlined derivation, turning a cheap projection into the dominant
  * per-row cost: the streaming fuzzy_link measured 355 s at sf10 where
  * the identical pipeline over a pre-materialized name column needs
  * 84 s. A single-child native expression caps the blow-up structurally
  * — any duplicated copy re-evaluates `name` exactly once — and the
  * fused loop stays inside whole-stage codegen.
  *
  * Semantics are EXACTLY the composed form's on non-null input (the
  * bit-identity spec pins this): the identity key first, then deletions
  * in character-position order, `array_distinct` first-occurrence
  * dedup, character (codepoint) indexing — an empty string blocks under
  * its identity key alone. On NULL the composed form yields `[NULL]`
  * while this expression yields NULL (null-intolerant, the useful
  * contract); every call site filters `name IS NOT NULL` first.
  */
case class DeletionKeys(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"deletion_keys expects string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deletion_keys"

  override protected def nullSafeEval(input: Any): Any =
    DeletionKeys.build(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeletionKeys.build($c)")

  override protected def withNewChildInternal(newChild: Expression): DeletionKeys =
    copy(child = newChild)
}

object DeletionKeys {

  /** `[s] ++ single-character deletions of s`, first-occurrence order,
    * deduplicated. Character-indexed via UTF8String.substring (codepoint
    * semantics, matching `substr`). Called from generated code through
    * this object's static forwarder.
    */
  def build(s: UTF8String): ArrayData = {
    val n = s.numChars()
    val out = new java.util.LinkedHashSet[UTF8String](n + 2)
    out.add(s)
    var i = 0
    while (i < n) {
      out.add(UTF8String.concat(s.substring(0, i), s.substring(i + 1, n)))
      i += 1
    }
    new GenericArrayData(out.toArray(Array.empty[AnyRef]))
  }

  /** Column wrapper. */
  def deletionKeys(name: Column): Column =
    Bridge.column(DeletionKeys(Bridge.expr(name)))
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ArrayContains, ArraysOverlap, CreateArray, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.ArrayType

/** Optimizer rule: `arrays_overlap(col, <literal single-element array>)`
  * → `array_contains(col, elem)`.
  *
  * The single-selected-value case is the common shape of the reference's
  * fuel filter (dashboard.py:710, P15 — one fuel picked in the UI);
  * `array_contains` is the cheaper specialized kernel (no per-row set
  * build over the right side). Null semantics are identical for a
  * non-null literal element: both yield null when the column is null or
  * contains nulls without a match, true on a match, false otherwise.
  *
  * Registered by [[GraftExtensions]] (`injectOptimizerRule`) for
  * extension-built sessions, or appended to
  * `spark.experimental.extraOptimizations` on an existing session.
  */
object SingleElementOverlapToContains extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArraysOverlap(l, CreateArray(Seq(e: Literal), _)) if e.value != null =>
        ArrayContains(l, e)
      // arr.get (not arr.array) — UnsafeArrayData literals don't support
      // the raw array() view and would throw during optimization.
      case ArraysOverlap(l, Literal(arr: ArrayData, ArrayType(et, _)))
          if arr.numElements() == 1 && !arr.isNullAt(0) =>
        ArrayContains(l, Literal(arr.get(0, et), et))
    }
}

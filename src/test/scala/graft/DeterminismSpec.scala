package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** No registered query may contain a nondeterministic expression.
  *
  * At cluster scale, task RETRY and speculative execution re-run
  * arbitrary partitions: an expression that returns different values
  * on re-evaluation (`rand()`, `uuid()`,
  * `monotonically_increasing_id()`, a nondeterministic UDF) makes a
  * retried task emit different rows than its first attempt — output
  * that depends on which attempt won, corrupting joins, dedup keys,
  * and samples silently. The engine's design rule is hash-based
  * determinism everywhere (q38/q58's md5 sampling instead of rand;
  * sorted-fold float aggregation; pinned tie-breaks); this spec
  * enforces the rule structurally by walking every query's ANALYZED
  * plan and asserting each expression subtree reports
  * `deterministic`. A violation names the offending expressions, so
  * the failure is diagnosable at the line that introduced them.
  *
  * (Order-SENSITIVE aggregates — first, collect_list — are
  * deterministic per-evaluation and are governed separately by the
  * sorted-fold/sort_array conventions the oracle gate hash-checks.)
  */
class DeterminismSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name: analyzed plan has no nondeterministic expressions") {
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.analyzed
      // collectWithSubqueries, not plain flatMap: Expression.collect
      // does not descend into SubqueryExpression PLANS, so a rand()
      // inside a scalar/IN/EXISTS subquery would otherwise pass the
      // gate undetected (review-caught).
      val bad = plan.collectWithSubqueries { case p =>
        p.expressions.flatMap(_.collect { case e if !e.deterministic => e })
      }.flatten
      assert(bad.isEmpty,
        s"$name contains nondeterministic expressions (unsafe under " +
          s"task retry/speculation): ${bad.map(_.sql).distinct.mkString("; ")}")
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftExtensions

/** GraftExtensions wiring: a session built with the extension class must
  * expose `cosine_sim` in SQL and run the arrays_overlap→array_contains
  * optimizer rule — the deployment path for user clusters
  * (`spark.sql.extensions=graft.functions.GraftExtensions`), as opposed
  * to `Functions.register` on an already-built session.
  *
  * The extension session shares the test SparkContext (extensions apply
  * at *session* construction); default/active sessions are restored
  * afterwards so the shared fixture is untouched. Never `stop()` the
  * extension session — that would stop the shared context.
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val shared: SparkSession = SparkTest.session
  val dir = "/root/testdata/sf0.001"

  private def withExtensionSession[A](f: SparkSession => A): A = {
    shared.sparkContext // force the shared context to exist first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      f(ext)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("injectFunction: cosine_sim resolves in SQL and matches the Column API") {
    withExtensionSession { ext =>
      val row = ext.sql(
        "SELECT cosine_sim(array(double(3), double(4)), array(double(4), double(3))) AS c")
        .collect()(0)
      assert(math.abs(row.getDouble(0) - 24.0 / 25.0) < 1e-12)
    }
  }

  test("injectFunction: sq_dist_long resolves in SQL with exact integer result") {
    withExtensionSession { ext =>
      val row = ext.sql(
        "SELECT sq_dist_long(array(1L, 2L, 3L), array(4L, 6L, 3L)) AS d")
        .collect()(0)
      assert(row.getLong(0) == 25L) // 3² + 4² + 0²
    }
  }

  test("injectFunction: sq_dist_double resolves in SQL with the sequential-fold result") {
    withExtensionSession { ext =>
      val row = ext.sql(
        "SELECT sq_dist_double(array(1.0d, 2.0d, 3.0d), array(4.0d, 6.0d, 3.0d)) AS d")
        .collect()(0)
      assert(row.getDouble(0) == 25.0) // 3² + 4² + 0²
    }
  }

  test("injectOptimizerRule: single-element arrays_overlap rewrites to array_contains") {
    withExtensionSession { ext =>
      // Parquet-backed scan: a local relation would constant-fold the
      // whole predicate away before the rule could be observed.
      val df = Tables.load(ext, dir, "part")
        .filter(arrays_overlap(split(col("p_name"), " "), array(lit("blue"))))
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("array_contains"), s"rule did not fire:\n$opt")
      assert(!opt.contains("arrays_overlap"), s"arrays_overlap survived:\n$opt")
      // And the rewrite is semantics-preserving on real data.
      val n = df.count()
      val expected = Tables.load(ext, dir, "part")
        .filter(array_contains(split(col("p_name"), " "), "blue")).count()
      assert(n == expected && n > 0)
    }
  }

  test("the shared session is not mutated by extension-session construction") {
    withExtensionSession { _ => () }
    // cosine_sim must not leak into the shared session's registry unless
    // Functions.register was explicitly called on it (other suites may
    // do so — only assert the session identity survived).
    assert(SparkSession.getDefaultSession.contains(shared))
    assert(shared.sql("SELECT 1 AS one").collect()(0).getInt(0) == 1)
  }
}

package graft

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

/** Pins `SparkEntry.queries.keySet` against a committed expectation file
  * (VERDICT r8 item 7): the driver's correctness gate enumerates exactly
  * this registry, so an accidental rename/removal — which would silently
  * shrink the gate — fails CI here instead of surfacing as a missing row
  * in the next CORRECTNESS report. Adding a query is a DELIBERATE act:
  * update `src/test/resources/registry_queries.txt` in the same commit.
  */
class RegistrySpec extends AnyFunSuite {

  test("SparkEntry.queries matches the committed registry expectation") {
    val stream = getClass.getResourceAsStream("/registry_queries.txt")
    // Fail diagnosably, not with a bare NPE from Source, if the
    // expectation file ever drops out of the test classpath.
    assert(stream != null,
      "registry_queries.txt missing from src/test/resources — the " +
        "registry pin cannot run without its committed expectation")
    val src = Source.fromInputStream(stream)
    val expected = try src.getLines().map(_.trim).filter(_.nonEmpty).toSet
    finally src.close()
    val actual = SparkEntry.queries.keySet
    val missing = expected -- actual
    val extra = actual -- expected
    assert(missing.isEmpty,
      s"queries removed from the registry (gate would shrink): ${missing.toSeq.sorted}")
    assert(extra.isEmpty,
      s"queries not in registry_queries.txt (add them deliberately): ${extra.toSeq.sorted}")
  }

  test("oracleSql and oracleStaged key into the registry") {
    val qs = SparkEntry.queries.keySet
    val osql = SparkEntry.oracleSql.keySet
    assert((osql -- qs).isEmpty,
      s"oracleSql entries with no query (dead oracle): ${(osql -- qs).toSeq.sorted}")
    val staged = SparkEntry.oracleStaged
    assert((staged.keySet -- qs).isEmpty,
      s"oracleStaged entries with no query: ${(staged.keySet -- qs).toSeq.sorted}")
    // A staged replay is a fallback FOR a composed oracle — a staged
    // entry without a composed one would never be tried by check.py.
    assert((staged.keySet -- osql).isEmpty,
      s"oracleStaged entries with no composed oracle: ${(staged.keySet -- osql).toSeq.sorted}")
    staged.foreach { case (name, stages) =>
      assert(stages.nonEmpty, s"$name: empty staged replay")
      stages.init.foreach { st =>
        val head = st.trim.takeWhile(_ != ' ').toUpperCase
        assert(head == "CREATE" || head == "INSERT",
          s"$name: non-final staged stage must CREATE/INSERT, got: ${st.take(60)}")
      }
      assert(stages.last.trim.toUpperCase.startsWith("SELECT"),
        s"$name: final staged stage must be the SELECT check.py compares: " +
          stages.last.take(60))
    }
  }
}

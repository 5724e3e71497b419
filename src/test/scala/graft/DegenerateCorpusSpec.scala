package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must SURVIVE degenerate inputs: an empty
  * corpus and a single-row-per-table corpus.
  *
  * This is a scale invariant, not an edge-case nicety: at 100 TB a
  * partition-pruned read (date filter, source filter, a new tenant)
  * routinely hands an operator ZERO rows, and a driver-side sizing
  * action (`collect()` of a stats aggregate, centroid sampling, a
  * loop-until-converged bound) that assumes rows exist turns a benign
  * empty partition into a pipeline abort. Same for cardinality-1: any
  * `require(n >= k)` hiding in a training/sampling op fires the first
  * time a filter leaves fewer rows than its parameter.
  *
  * Contract asserted per query, per fixture: construction + execution
  * do not throw, and the result schema is IDENTICAL to the sf0.001
  * schema (an empty input must not change the shape downstream
  * consumers bound to — a schema that mutates when a partition prunes
  * to nothing breaks unioned/appended sinks at scale).
  *
  * Fixtures are `limit(0)` / `limit(1)` slices of the real sf0.001
  * tables written under target/ — schema-exact by construction,
  * rebuilt per run so testdata regeneration can never strand them.
  */
class DegenerateCorpusSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  private val src = "/root/testdata/sf0.001"

  private def build(tag: String, n: Int): String = {
    val dir = s"target/degenerate-$tag"
    for (t <- Tables.all) {
      // Tables.load (not a raw read) so events.ts round-trips through
      // the epoch-nanos LongType normalization — the written fixture
      // then satisfies load's contract on every testdata generation.
      Tables.load(spark, src, t).limit(n)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private lazy val emptyDir: String = build("empty", 0)
  private lazy val tinyDir: String = build("tiny", 1)

  // Reference schemas memoized: constructing an eager query (training
  // ops run sizing jobs at build time) twice per fixture would double
  // the suite's cost for no extra evidence.
  private val refSchema =
    collection.mutable.Map.empty[String, org.apache.spark.sql.types.StructType]

  private def check(name: String, dir: String): Unit = {
    val degenerate = SparkEntry.queries(name)(spark, dir)
    degenerate.count() // must not throw; row count itself is free-form
    val reference = refSchema.getOrElseUpdate(
      name, SparkEntry.queries(name)(spark, src).schema)
    assert(degenerate.schema == reference,
      s"$name: degenerate-input schema drifted from the sf0.001 schema")
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name survives an empty corpus") { check(name, emptyDir) }
    test(s"$name survives a single-row corpus") { check(name, tinyDir) }
  }
}

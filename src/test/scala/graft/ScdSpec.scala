package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Sampling, Scd}

/** SCD2 history build (q54) and weighted pick (q55) semantics on
  * constructed frames — interval edges, collapse rules, determinism
  * under repartitioning, and the one-shuffle plan shape.
  */
class ScdSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  // (key, state, ts_ns, tie) — insertion order deliberately scrambled:
  // the operator must order by (ts, tie) itself.
  private val changelog = Seq(
    ("u1", "B", 2000L, 20L), // change        -> [2, 3) v2
    ("u1", "A", 1000L, 10L), // opens history -> [1, 2) v1
    ("u1", "B", 3000L, 30L), // consecutive dup: collapsed
    ("u1", "A", 4000L, 40L), // back to A     -> [4, null) v3
    ("u2", "X", 5000L, 50L)  // single event  -> [5, null) v1
  )

  test("scd2: collapse, validity chain, open current interval, versions") {
    val df = changelog.toDF("k", "st", "ts", "tie")
    val got = Scd.scd2(df, "k", "st", "ts", "tie")
      .as[(String, String, Long, Option[Long], Int)].collect().toSet
    // ts emitted as µs = ns div 1000 (cross-engine resolution, see Scd).
    assert(got == Set(
      ("u1", "A", 1L, Some(2L), 1),
      ("u1", "B", 2L, Some(4L), 2),
      ("u1", "A", 4L, None, 3),
      ("u2", "X", 5L, None, 1)))
  }

  test("scd2: same-µs tie is broken by the tie column, consistently for lag and lead") {
    // Two changes inside the same microsecond (ns 1000 and 1500 both
    // div to µs 1): order must come from `tie`, and valid_to chains in
    // that same order.
    val df = Seq(
      ("u", "A", 1000L, 1L),
      ("u", "B", 1500L, 2L),
      ("u", "C", 9000L, 3L)
    ).toDF("k", "st", "ts", "tie")
    val got = Scd.scd2(df, "k", "st", "ts", "tie")
      .as[(String, String, Long, Option[Long], Int)].collect().toSet
    assert(got == Set(
      ("u", "A", 1L, Some(1L), 1),
      ("u", "B", 1L, Some(9L), 2),
      ("u", "C", 9L, None, 3)))
  }

  test("scd2: null states never collapse (SQL <> is null-guarded on both engines)") {
    val df = Seq(
      ("u", Some("A"), 1000L, 1L),
      ("u", None: Option[String], 2000L, 2L), // null state — see assertions
      ("u", Some("A"), 3000L, 3L)
    ).toDF("k", "st", "ts", "tie")
    val got = Scd.scd2(df, "k", "st", "ts", "tie")
      .as[(String, Option[String], Long, Option[Long], Int)].collect().toSet
    // Row 2 (null state): prev = "A", "A" <> null -> null -> DROPPED.
    // Row 3: prev = null-state row's value = null -> isNull branch keeps it
    // even though the status equals v1's — null rows break collapse chains
    // identically in Spark and DuckDB, which is all determinism needs.
    assert(got == Set(
      ("u", Some("A"), 1L, Some(3L), 1),
      ("u", Some("A"), 3L, None, 2)))
  }

  test("q54 plan: the whole history build is ONE shuffle + ONE sort " +
    "(lag filter, lead and version share the (key, ts) clustering)") {
    val p = SparkEntry.queries("q54_scd2")(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(FormattedMode)
    assert("- Exchange".r.findAllIn(p).length == 1, s"expected one shuffle:\n${p.take(1200)}")
    assert("- Sort".r.findAllIn(p).length == 1, s"expected one sort:\n${p.take(1200)}")
  }

  // --- q55 weighted pick ---

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("weightedPick: winner is the min ticket hash per stratum (vs in-memory reference)") {
    val docs = Seq(
      ("s1", 11L, 3L), ("s1", 12L, 1L), ("s1", 13L, 5L),
      ("s2", 21L, 1L), ("s2", 22L, 1L))
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val win = ds.flatMap { case (_, id, w) =>
        (1L to w).map(t => (md5hex(s"$id:$t"), id))
      }.min
      (src, win._2)
    }.toSet
    val df = docs.toDF("source", "doc_id", "w").repartition(7) // order-independence
    val got = Sampling.weightedPick(df, "source", "doc_id", col("w"))
      .as[(String, Long)].collect().toSet
    assert(got == expected)
  }

  test("weightedPick: zero/negative weight yields no tickets — doc can never win") {
    // Ids chosen adversarially: md5("1:0") = 81b2… beats md5("4:1") =
    // f4a9…, so if weight-0 rows ever get phantom tickets again
    // (sequence(1, 0) defaults to step -1 and yields [1, 0]), doc 1
    // WOULD win and this fails — not a pass-by-hash-luck fixture.
    val df = Seq(("s", 1L, 0L), ("s", 4L, 1L), ("s", 5L, -2L))
      .toDF("source", "doc_id", "w")
    val got = Sampling.weightedPick(df, "source", "doc_id", col("w"))
      .as[(String, Long)].collect().toSet
    assert(got == Set(("s", 4L)))
  }

  test("q55 plan: min(struct) aggregate is partial+final (one candidate per task reaches the shuffle)") {
    val p = SparkEntry.queries("q55_weighted_pick")(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(FormattedMode)
    // Struct-ordered min isn't hash-aggregable — Spark plans Sort- or
    // ObjectHashAggregate (same as the pinned s3 argmax); what matters
    // for scale is the partial+final PAIR around a single exchange.
    val aggs = "- SortAggregate".r.findAllIn(p).length +
      "- ObjectHashAggregate".r.findAllIn(p).length
    assert(aggs == 2, s"expected partial+final aggregate pair:\n${p.take(1200)}")
    assert("- Exchange".r.findAllIn(p).length == 1, s"expected one shuffle:\n${p.take(1200)}")
  }
}

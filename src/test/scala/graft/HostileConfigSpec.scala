package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Results must be invariant under hostile-but-legal session configs.
  *
  * A library operator does not own its session: on a shared cluster it
  * inherits whatever `spark.sql.shuffle.partitions`, AQE, or broadcast
  * settings the platform team chose. Several operators make explicit
  * scale arguments about exactly these knobs (d15's repartition-skip
  * bound reasons about a 200-partition session; its verify join bans
  * unmeasured AQE broadcasts), so this spec pins the CONTRACT those
  * arguments assume: config moves the plan, never the rows.
  *
  * Five hostile sessions via `newSession()` (shared SparkContext,
  * independent SQLConf): 200 shuffle partitions (a default-config
  * cluster, 25× our test session's 8), AQE disabled (static planning
  * only), auto-broadcast disabled (threshold -1 — explicit
  * `broadcast()`/hints still apply, but every AQE/stats-driven
  * broadcast decision flips to a shuffle join), ANSI mode disabled
  * (legacy null-on-error evaluation), and a UTC+14 session timezone.
  * Queries compared row-for-row (multiset) against the default
  * session's output.
  *
  * Coverage: the queries whose plans actually DEPEND on these knobs —
  * the multi-shuffle dedup/retrieval/training pipelines with sizing
  * logic, adaptive joins, or iterative actions. Narrow per-row queries
  * are config-blind by construction and already covered by the oracle
  * gate.
  */
class HostileConfigSpec extends AnyFunSuite {
  lazy val base: SparkSession = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  private val names = Seq(
    "d2_minhash_lsh", "d9_dedup_clusters", "d11_semantic_dedup",
    "d15_prefix_jaccard", "t12_bm25", "t17_hybrid_rrf",
    "s7_kmeans_assign", "s3b_ivf_trained", "c5_curation2",
    "q62_fuzzy_join")

  // Multiset of row renderings: duplicates preserved, order ignored.
  // Same JVM + operators already pinned order-deterministic (oracle
  // hash gate), so string renderings are directly comparable.
  private def rows(s: SparkSession, name: String): Map[String, Int] =
    SparkEntry.queries(name)(s, dir).collect()
      .groupBy(_.toString).view.mapValues(_.length).toMap

  private def hostile(confs: (String, String)*): SparkSession = {
    val s = base.newSession()
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    s
  }

  private val scenarios: Seq[(String, () => SparkSession)] = Seq(
    ("200 shuffle partitions",
      () => hostile("spark.sql.shuffle.partitions" -> "200")),
    ("AQE disabled",
      () => hostile("spark.sql.adaptive.enabled" -> "false")),
    ("auto-broadcast disabled",
      () => hostile("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")),
    // Legacy (non-ANSI) evaluation: casts silently null, div-by-zero
    // yields null instead of erroring — a Spark-3-migration cluster's
    // common setting. These operators are total functions by design
    // (no error-reliant paths), so the mode must not move a row.
    ("ANSI mode disabled",
      () => hostile("spark.sql.ansi.enabled" -> "false")),
    // A UTC+14 session zone: these pipelines are epoch-integer / text
    // end to end (no timestamp formatting), so any divergence here
    // means a hidden local-time dependence leaked in.
    ("a UTC+14 session timezone",
      () => hostile("spark.sql.session.timeZone" -> "Pacific/Kiritimati")))

  for (name <- names) {
    // Reference computed lazily once per query, reused by all scenarios.
    lazy val expected = rows(base, name)
    for ((label, mk) <- scenarios) {
      test(s"$name: identical rows under $label") {
        assert(rows(mk(), name) == expected,
          s"$name rows changed under $label — config leaked into results")
      }
    }
  }
}

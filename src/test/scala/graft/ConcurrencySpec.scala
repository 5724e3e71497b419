package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Concurrent queries on ONE shared session must not interfere.
  *
  * A platform deployment runs many pipelines against the same
  * SparkSession (notebook servers, schedulers, a query service) —
  * Spark's scheduler is built for concurrent jobs, but LIBRARY code
  * can break the contract with session-global mutable state: a
  * fixed-name temp view, a read-modify-write session conf, a shared
  * cache released mid-flight by another query. The operators here
  * deliberately avoid all three (no temp views; the only query-path
  * conf write is Tables.load's idempotent same-value nanosAsLong set;
  * no operator calls a global clearCache — per-invocation persists
  * stay registered in OpCaches until the EMBEDDER releases them, and
  * unpersist is recompute-safe anyway, so a release racing a reader
  * degrades to recompute, never to wrong rows) — this spec pins that
  * by racing the stateful-est queries and comparing against serial
  * runs, then racing an OpCaches.release against live queries.
  *
  * Query mix: memoized curation (c1/c5 share one `Curated` per
  * (session, dir) through a ConcurrentHashMap — computeIfAbsent under
  * race is exactly what the memo claims to support), eager driver-side
  * sizing + persist (d15), iterative localCheckpoint loops (d9),
  * training actions (s7), a checkpointing retrieval op (t12), and two
  * plain shuffle queries as control. Each runs TWICE concurrently on
  * an 8-thread pool, so every query races both itself and the others.
  */
class ConcurrencySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  private val names = Seq(
    "c1_curation", "c5_curation2", "d15_prefix_jaccard",
    "d9_dedup_clusters", "s7_kmeans_assign", "t12_bm25",
    "q1_agg", "t6_tfidf", "q62_fuzzy_join")

  private def rows(name: String): Map[String, Int] =
    SparkEntry.queries(name)(spark, dir).collect()
      .groupBy(_.toString).view.mapValues(_.length).toMap

  test("every query returns serial-identical rows when raced 2x on a shared session") {
    val serial = names.map(n => n -> rows(n)).toMap
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val racing = (1 to 2).flatMap(_ => names).map { n =>
        Future(n -> rows(n))
      }
      val results = Await.result(Future.sequence(racing), 10.minutes)
      for ((n, r) <- results)
        assert(r == serial(n), s"$n diverged under concurrent execution")
    } finally pool.shutdown()
  }

  test("OpCaches.release races live queries without changing results, and empties the registry") {
    val serial = rows("d15_prefix_jaccard")
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val racing = (1 to 3).map { _ =>
        Future(rows("d15_prefix_jaccard"))
      } :+ Future { graft.ops.OpCaches.release(spark); Map.empty[String, Int] }
      val results = Await.result(Future.sequence(racing), 10.minutes)
      for (r <- results if r.nonEmpty)
        assert(r == serial, "d15 diverged when racing OpCaches.release")
    } finally pool.shutdown()
    graft.ops.OpCaches.release(spark)
    assert(graft.ops.OpCaches.registered(spark) == 0,
      "release must empty the session's registry")
  }
}

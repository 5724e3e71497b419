package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Smoke gate for the streaming-throughput harness: every measured op
  * consumes the full staged event stream (no silent drops from the
  * chronological staging + watermark interplay) and the stateful
  * aggregations emit. Tiny fixture (sf0.001, 2 micro-batches) — the
  * real measurement runs via `runMain graft.StreamBench` (SCALE.md).
  *
  * Expectations are computed from the fixture (total rows, distinct
  * dedup keys), not hardcoded — a testdata regeneration that introduces
  * a (facility_id, timestamp) collision is a legitimate fixture, not a
  * code bug.
  */
class StreamBenchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session

  test("StreamBench.run: all ops consume every event; aggs emit (RocksDB)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = "/root/testdata/sf0.001"
      val shaped = StreamBench.facilityShape(Tables.load(spark, dir, "events"))
      val totalRows = shaped.count()
      // Staging is chronological, so no event is watermark-late: the
      // streaming dedup output must equal the batch distinct count.
      val distinctKeys = shaped
        .select(countDistinct(col("facility_id"), col("timestamp"))).head.getLong(0)

      val result = StreamBench.run(spark, dir, 2)
      assert(result.stagedFiles == 2)
      val results = result.ops.toMap
      val expected = Set("windowed_agg", "hop_window", "session_window",
        "dedup", "latest_fmgws", "latest_tws", "fuzzy_link")
      assert(results.keySet == expected)
      results.foreach { case (name, r) =>
        assert(r.rows == totalRows, s"$name consumed ${r.rows} of $totalRows input rows")
        assert(r.batches == 2, s"$name ran ${r.batches} batches, expected 2")
      }
      // Update-mode ops emit per batch; dedup passes distinct rows
      // through. The watermarked append aggs emit once the watermark
      // passes a window — with chronological staging most windows
      // finalize in-run.
      assert(results("dedup").outRows == distinctKeys,
        s"dedup emitted ${results("dedup").outRows}, expected $distinctKeys distinct keys")
      Seq("latest_fmgws", "latest_tws", "windowed_agg", "hop_window",
          "fuzzy_link").foreach { n =>
        assert(results(n).outRows > 0, s"$n emitted nothing")
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

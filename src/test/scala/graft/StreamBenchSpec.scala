package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke gate for the streaming-throughput harness: every measured op
  * consumes the full staged event stream (no silent drops from the
  * chronological staging + watermark interplay) and the stateful
  * aggregations emit. Tiny fixture (sf0.001, 2 micro-batches) — the
  * real measurement runs via `runMain graft.StreamBench` (SCALE.md).
  */
class StreamBenchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session

  test("StreamBench.run: all ops consume every event; aggs emit (RocksDB)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val results = StreamBench.run(spark, "/root/testdata/sf0.001", 2).toMap
      val expected = Set("windowed_agg", "hop_window", "session_window",
        "dedup", "latest_fmgws", "latest_tws")
      assert(results.keySet == expected)
      results.foreach { case (name, r) =>
        assert(r.rows == 1000L, s"$name consumed ${r.rows} of 1000 input rows")
        assert(r.batches == 2, s"$name ran ${r.batches} batches, expected 2")
      }
      // Update-mode ops emit per batch; dedup passes rows through. The
      // watermarked append aggs emit once the watermark passes a window
      // — with chronological staging most windows finalize in-run.
      assert(results("dedup").outRows == 1000L)
      Seq("latest_fmgws", "latest_tws", "windowed_agg", "hop_window").foreach { n =>
        assert(results(n).outRows > 0, s"$n emitted nothing")
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

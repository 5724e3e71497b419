package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Rate-paced infinite replay of a bounded table as a stream (ref S11:
  * publisher.py:45-88 — the publisher loops the week-long cache forever
  * at ~10 events/s with a cooldown between cycles).
  *
  * Spark-first shape: the `rate` streaming source supplies monotonically
  * increasing ticks; a stream-static equi-join on `tick % n_rows` maps
  * each tick onto the next cached event in timestamp order — chronological
  * pacing without any driver-side loop, at any requested events/s. The
  * `cycle` column (tick / n_rows) makes replay wrap-around explicit so
  * downstream watermarking can treat each cycle as an epoch
  * (SURVEY §7.4.3 — event time regresses at the wrap; keying state by
  * (cycle, window) keeps late-data semantics sane).
  */
object Replay {

  /** Index a bounded event table 0..n-1 in (timestamp, tiebreak) order.
    * The window sort is a one-off prep over the bounded cache, not the
    * streaming hot path.
    */
  def indexed(events: DataFrame, orderCols: Seq[String]): DataFrame = {
    val w = Window.orderBy(orderCols.map(col): _*)
    events.withColumn("replay_idx", row_number().over(w) - 1)
  }

  /** The replay stream: one cached event per rate tick, cycling forever.
    * `eventsPerSecond` is the publisher's pacing knob (ref publisher.py:27).
    */
  def stream(spark: SparkSession, indexedEvents: DataFrame, nRows: Long,
      eventsPerSecond: Int): DataFrame = {
    val ticks = spark.readStream
      .format("rate")
      .option("rowsPerSecond", eventsPerSecond.toString)
      .load()
    ticks
      .select(col("value")) // drop the rate source's wall-clock timestamp
      .withColumn("replay_idx", col("value") % nRows)
      .withColumn("cycle", (col("value") / nRows).cast("long"))
      .join(indexedEvents, Seq("replay_idx"))
      .withColumnRenamed("replay_idx", "idx")
  }
}

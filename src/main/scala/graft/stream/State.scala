package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stateful stream aggregations (ref dashboard.py:256-561).
  *
  * The dashboard keeps (a) latest-event-per-key maps and (b) a bounded
  * history it re-aggregates every 3 s. Spark-first both are *streaming
  * aggregations*, not reimplemented state:
  *
  *   - latest-per-key = `max_by(struct(measures…), event_ts)` per key in
  *     update mode — the publisher always emits complete records
  *     (publisher.py:63-80) so field-wise dict-merge ≡ whole-record
  *     last-write-wins (SURVEY §7.4.5);
  *   - windowed totals = watermarked 5-min tumbling windows (A9/T2); the
  *     deque(5000) count bound becomes a time bound — the watermark covers
  *     the 60-min query horizon and strictly dominates it (SURVEY §7.4.2).
  *
  * Both run identically over a batch frame (tests + backfill) and a
  * streaming frame (the contract: same code, two execution modes).
  */
object State {

  /** Latest facility reading per facility (ref dashboard.py:363-365, A5). */
  def latestPerFacility(events: DataFrame): DataFrame =
    events.groupBy(col("facility_id"))
      .agg(max_by(
        struct(col("timestamp"), col("power_mw"), col("co2_tonnes")),
        // Tie-break on the raw string after the instant — deterministic
        // last-write-wins even when two offsets name the same instant.
        struct(col("event_ts"), col("timestamp"))).as("latest"))
      .select(col("facility_id"), col("latest.*"))

  /** Latest market reading per region (ref dashboard.py:390-392). */
  def latestPerRegion(events: DataFrame): DataFrame =
    events.groupBy(col("region_id"))
      .agg(max_by(
        struct(col("timestamp"), col("price_dmwh"), col("demand_mw")),
        struct(col("event_ts"), col("timestamp"))).as("latest"))
      .select(col("region_id"), col("latest.*"))

  /** 5-minute tumbling totals with a watermark that covers the 60-min
    * dashboard horizon (ref dashboard.py:546-555, A9/T2/W3). Streaming:
    * append mode emits a bucket once the watermark passes it. Callers
    * apply region/fuel predicates (P14/P15) on the input frame *before*
    * this aggregation (see PipelineSpec) — filter-then-aggregate, never
    * aggregate-then-filter.
    */
  def windowedTotals(enrichedFacilityEvents: DataFrame,
      watermark: String = "60 minutes"): DataFrame =
    enrichedFacilityEvents
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), "5 minutes").as("bucket"))
      .agg(
        sum(col("power_mw")).as("total_power_mw"),
        sum(col("co2_tonnes")).as("total_co2_tonnes"))
      .select(col("bucket.start").as("bucket_start"),
        col("total_power_mw"), col("total_co2_tonnes"))

  /** Hopping (overlapping) windows — the streaming twin of batch q57:
    * `size`-long windows every `slide`, each event contributing to
    * size/slide of them. The engine multiplies state by that overlap
    * factor (one aggregate row per open window), still bounded by the
    * watermark horizon — the cost model is identical to q57's bounded
    * overlap explode, just held in the state store instead of a
    * shuffle.
    */
  def hoppingTotals(enrichedFacilityEvents: DataFrame,
      size: String = "10 minutes", slide: String = "5 minutes",
      watermark: String = "60 minutes"): DataFrame =
    enrichedFacilityEvents
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), size, slide).as("bucket"))
      .agg(sum(col("power_mw")).as("total_power_mw"))
      .select(col("bucket.start").as("bucket_start"), col("total_power_mw"))

  /** Stream-stream join (engine extension; the reference aligns the two
    * event types only via the batch wide-cache left join, J6): enriched
    * facility events ⋈ market events on (region, 5-min event-time
    * bucket) — every facility reading gains the regional price/demand of
    * its interval, e.g. for $-per-MWh attribution. Both sides carry
    * watermarks, so join state is bounded to the horizon; bucket equality
    * (not a raw ts range) keeps the join an equi-join — hash-partitioned
    * by (region, bucket), no interval scan.
    */
  def facilityMarketJoin(enrichedFacilityEvents: DataFrame,
      marketEvents: DataFrame, watermark: String = "30 minutes"): DataFrame = {
    val f = enrichedFacilityEvents
      .withWatermark("event_ts", watermark)
      .withColumn("bucket", window(col("event_ts"), "5 minutes"))
    val m = marketEvents
      .withWatermark("event_ts", watermark)
      .withColumn("m_bucket", window(col("event_ts"), "5 minutes"))
      .select(col("region_id").as("m_region"), col("m_bucket"),
        col("price_dmwh"), col("demand_mw"))
    f.join(m,
      col("region") === col("m_region") && col("bucket") === col("m_bucket"))
      .select(col("facility_id"), col("region"),
        col("bucket.start").as("bucket_start"),
        col("power_mw"), col("co2_tonnes"), col("price_dmwh"), col("demand_mw"))
  }

  /** Session-window totals over a stream: per-facility sessions closed
    * by `gap` of event-time inactivity (dynamic-gap windows — state
    * merges adjacent windows as events arrive; append emits a session
    * once the watermark passes its close).
    */
  def sessionTotals(facilityEvents: DataFrame, gap: String = "15 minutes",
      watermark: String = "30 minutes"): DataFrame =
    facilityEvents
      .withWatermark("event_ts", watermark)
      .groupBy(col("facility_id"), session_window(col("event_ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col("power_mw")).as("session_power"))
      .select(col("facility_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("session_power"))

  /** At-least-once → effectively-once (ref T5: MQTT QoS 1 redelivery +
    * the dedup-set readme.md:157 describes): drop duplicate
    * (facility_id, timestamp) deliveries under the watermark — state for
    * the dedup set is time-bounded, exactly the deviation SURVEY §7.4.2
    * documents for the count-bounded reference structures.
    */
  def dedupEvents(events: DataFrame, watermark: String = "60 minutes"): DataFrame =
    events.withWatermark("event_ts", watermark)
      .dropDuplicates(Seq("facility_id", "timestamp"))

  /** The dashboard's scalar headline metrics over the latest-per-key
    * state (ref dashboard.py:716-729, A6-A8): filtered sums/avg + the
    * modal timestamp as "last updated" (deterministic tie-break: smallest,
    * like pandas `mode()[0]`, SURVEY §7.4.6).
    */
  def headlineMetrics(latestFacility: DataFrame): DataFrame = {
    val m = latestFacility.agg(
      sum(col("power_mw")).as("total_power_mw"),
      sum(col("co2_tonnes")).as("total_co2_tonnes"),
      count(lit(1)).as("n_facilities"))
    val mode = latestFacility.groupBy(col("timestamp"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("timestamp").asc)
      .limit(1)
      .select(col("timestamp").as("last_updated"))
    // Left join (not crossJoin): on empty input the limit-1 modal frame is
    // empty and a cross join would erase the totals row; Metrics.headline
    // deliberately survives empty input the same way.
    m.join(mode, lit(true), "left_outer")
  }
}

package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wide consolidate cache (ref extractor.py:291-309 `main`).
  *
  * The reference pivots to one column per (measure, entity) to cut CSV
  * redundancy ~75% (readme.md:132-141). On Spark the idiomatic store is
  * the *long* table in Parquet (columnar encoding already removes that
  * redundancy); the wide pivot is still provided for cache/API parity and
  * for consumers that want the reference's exact layout.
  *
  * pandas `pivot_table` defaults to `aggfunc='mean'` — duplicate
  * (ts, entity) cells AVERAGE (SURVEY §7.4.1) — so the pivots here use
  * `avg`, not `first`.
  *
  * Scale note: a pivot producing ~850 columns (419 facilities × 2) is fine;
  * pivot cardinality is bounded by the entity dim, not the fact table. The
  * explicit `values` list avoids Catalyst's extra distinct-scan job.
  */
object Consolidate {

  /** facility long → wide `power_<FAC>`, `emission_<FAC>` (ref
    * extractor.py:302-303, A2/W1). `facilityCodes` supplies the pivot
    * domain explicitly (one pass, deterministic column order).
    */
  def pivotFacility(facilityLong: DataFrame, facilityCodes: Seq[String]): DataFrame =
    facilityLong
      .groupBy("timestamp")
      .pivot("facility_code", facilityCodes)
      .agg(avg(col("power")).as("power"), avg(col("emission")).as("emission"))
      .select(col("timestamp") +: facilityCodes.flatMap(c => Seq(
        col(s"`${c}_power`").as(s"power_$c"),
        col(s"`${c}_emission`").as(s"emission_$c"))): _*)

  /** market long → wide `price_<REG>`, `demand_<REG>` (extractor.py:304-305). */
  def pivotMarket(marketLong: DataFrame, regionCodes: Seq[String]): DataFrame =
    marketLong
      .groupBy("timestamp")
      .pivot("region_code", regionCodes)
      .agg(avg(col("price")).as("price"), avg(col("demand")).as("demand"))
      .select(col("timestamp") +: regionCodes.flatMap(c => Seq(
        col(s"`${c}_price`").as(s"price_$c"),
        col(s"`${c}_demand`").as(s"demand_$c"))): _*)

  /** Left-join market onto facility timestamps (ref extractor.py:307, J6):
    * every facility timestamp survives even without market data; the melt
    * step later zero-fills those cells (zeros are load-bearing,
    * SURVEY §7.4.8).
    */
  def wideCache(facilityWide: DataFrame, marketWide: DataFrame): DataFrame =
    facilityWide.join(marketWide, Seq("timestamp"), "left_outer")

  /** Entity lists recovered from column-name prefixes (ref
    * publisher.py:49-50, P7 — schema-on-read over the wide cache).
    */
  def entityColumns(wide: DataFrame): (Seq[String], Seq[String]) = (
    wide.columns.filter(_.startsWith("emission_")).map(_.stripPrefix("emission_")).toSeq,
    wide.columns.filter(_.startsWith("price_")).map(_.stripPrefix("price_")).toSeq)
}

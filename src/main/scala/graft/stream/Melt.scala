package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wide cache → per-entity event records (ref publisher.py:45-88).
  *
  * The reference iterates rows in Python emitting one JSON dict per
  * entity; here it is `stack`-style unpivot (W2) — two unpivots (facility
  * measures, market measures) and a `unionByName` onto a single event
  * stream, exactly the publisher's one-topic union (§2.7).
  *
  * Missing market cells (facility timestamps without market rows from the
  * J6 left join) become 0.0, not null — zeros are load-bearing
  * (publisher.py:68-69,78-79; SURVEY §7.4.8).
  */
object Melt {

  /** One row per (timestamp, facility): {facility_id, timestamp, power_mw,
    * co2_tonnes} (publisher.py:63-70).
    */
  def facilityEvents(wide: DataFrame, facilityCodes: Seq[String]): DataFrame = {
    val stacked = facilityCodes.map(c =>
      struct(
        lit(c).as("facility_id"),
        col("timestamp"),
        coalesce(col(s"power_$c"), lit(0.0)).as("power_mw"),
        coalesce(col(s"emission_$c"), lit(0.0)).as("co2_tonnes")))
    wide.select(explode(array(stacked: _*)).as("e")).select(col("e.*"))
  }

  /** One row per (timestamp, region): {region_id, timestamp, price_dmwh,
    * demand_mw} (publisher.py:73-80).
    */
  def marketEvents(wide: DataFrame, regionCodes: Seq[String]): DataFrame = {
    val stacked = regionCodes.map(c =>
      struct(
        lit(c).as("region_id"),
        col("timestamp"),
        coalesce(col(s"price_$c"), lit(0.0)).as("price_dmwh"),
        coalesce(col(s"demand_$c"), lit(0.0)).as("demand_mw")))
    wide.select(explode(array(stacked: _*)).as("e")).select(col("e.*"))
  }

  /** The publisher's single-topic JSON stream: both event types encoded to
    * JSON and unioned (schema = one `value` string column, Kafka-shaped).
    */
  def jsonStream(wide: DataFrame, facilityCodes: Seq[String],
      regionCodes: Seq[String]): DataFrame =
    facilityEvents(wide, facilityCodes)
      .select(to_json(struct(col("*"))).as("value"))
      .unionByName(marketEvents(wide, regionCodes)
        .select(to_json(struct(col("*"))).as("value")))
}

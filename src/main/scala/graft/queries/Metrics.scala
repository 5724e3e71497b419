package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dashboard-parity batch queries over the latest-state frames (SURVEY
  * §7.1 step 9: P14-P16 filters + A6-A8 scalar metrics + A10 domains —
  * ref dashboard.py:457-729). These run identically over the streaming
  * sinks' output tables and over batch snapshots.
  */
object Metrics {

  /** Region + fuel filters (P14/P15, ref dashboard.py:704-713). */
  def filterFacilities(latest: DataFrame, regions: Seq[String],
      fuels: Seq[String]): DataFrame = {
    val byRegion = if (regions.isEmpty) latest
      else latest.filter(col("region").isin(regions.map(x => x: Any): _*))
    if (fuels.isEmpty) byRegion
    else byRegion.filter(arrays_overlap(col("fuel_tech"),
      array(fuels.map(lit): _*)))
  }

  /** The five headline scalars (A6-A8, ref dashboard.py:716-729): total
    * power, total CO₂, facility count, modal timestamp (smallest on tie,
    * pandas `mode()[0]` semantics), NaN/empty-guarded.
    */
  def headline(filteredLatest: DataFrame): DataFrame = {
    val sums = filteredLatest.agg(
      coalesce(round(sum(col("power_mw")), 2), lit(0.0)).as("total_power_mw"),
      coalesce(round(sum(col("co2_tonnes")), 2), lit(0.0)).as("total_co2_tonnes"),
      count(lit(1)).as("n_facilities"))
    val modalTs = filteredLatest.groupBy(col("timestamp"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("timestamp").asc)
      .limit(1)
      .select(col("timestamp").as("last_updated"))
    sums.join(modalTs, lit(true), "left_outer") // left: survive empty input
  }

  /** Fuel-label → emoji map (ref dashboard.py:193-213 — the UDF-shaped
    * dict chain done as a literal-map column lookup, §2.10: no UDF, stays
    * codegen'd; unknown fuels get the generic bolt like the reference's
    * fallback).
    */
  private val fuelEmoji: Map[String, String] = Map(
    "Solar (Utility)" -> "☀️", "Wind" -> "🌬️", "Coal (Black)" -> "🪨",
    "Coal (Brown)" -> "🪨", "Hydro" -> "💧", "Gas (CCGT)" -> "🔥",
    "Battery (Discharging)" -> "🔋", "Battery (Charging)" -> "🔋")

  def withFuelEmoji(df: DataFrame, fuelCol: String = "fuel"): DataFrame =
    df.withColumn("fuel_emoji",
      coalesce(element_at(typedLit(fuelEmoji), col(fuelCol)), lit("⚡")))

  /** P18 — headline-metric display labels (ref dashboard.py:590-597):
    * thousands separators, 1 decimal under 1000 in magnitude else 0,
    * unit suffix; null/unparseable coerces to 0.0 like the reference's
    * `float(val) except → 0.0` guard. `format_number` is codegen'd and
    * locale-fixed (en_US grouping, matching Python's `,` format).
    * Presentation-layer only — deliberately NOT oracle-mapped: number
    * formatting is exactly the kind of engine-dialect surface the
    * correctness gate should not hinge on (NOTES.md); pinned by unit
    * test instead.
    */
  def metricLabel(c: Column, unit: String): Column = {
    // try_cast, not cast: ANSI mode (this repo's default) throws on an
    // unparseable string, which is exactly the input the guard is for.
    val v = coalesce(c.try_cast("double"), lit(0.0))
    concat(
      when(abs(v) < 1000, format_number(v, 1)).otherwise(format_number(v, 0)),
      lit(" " + unit))
  }

  /** The headline frame with its two reference display labels. */
  def withMetricLabels(headline: DataFrame): DataFrame = headline
    .withColumn("power_label", metricLabel(col("total_power_mw"), "MW"))
    .withColumn("co2_label", metricLabel(col("total_co2_tonnes"), "t CO₂"))

  /** Filter-option domains (A10, ref dashboard.py:470-475): sorted
    * distinct fuels (exploded) and regions.
    */
  def domains(facilityDim: DataFrame): (Seq[String], Seq[String]) = {
    val fuels = facilityDim.select(explode(col("fuel_tech")).as("f"))
      .distinct().orderBy("f").collect().map(_.getString(0)).toSeq
    val regions = facilityDim.select(col("region")).distinct()
      .orderBy("region").collect().map(_.getString(0)).toSeq
    (fuels, regions) // driver-side: bounded by the dim, not the facts
  }
}

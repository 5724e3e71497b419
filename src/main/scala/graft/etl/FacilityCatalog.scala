package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** Facility-catalog ETL (ref extractor.py:60-113 `batch_facilities`).
  *
  * The reference iterates facility JSON row-at-a-time in Python; here the
  * same semantics are one declarative plan: explode(units) happens only
  * for the fuel-tech rollup, the operating filter is an `exists` higher-
  * order predicate on the array (no explode needed for the filter — at
  * catalog scale it doesn't matter, but the shape generalizes to
  * billion-row nested tables where exploding to filter is a 10× blowup).
  */
object FacilityCatalog {

  /** Facilities with ≥1 operating unit (ref extractor.py:77-87, P2/A3). */
  def operatingFacilities(facilitiesRaw: DataFrame): DataFrame =
    facilitiesRaw.filter(
      exists(col("units"), u => u.getField("status_id") === "operating"))

  /** Facility dimension (ref extractor.py:88-95, P3/P4/A4): project +
    * rename, fuel-tech labels of *operating* units via the taxonomy map,
    * dedup'd, `'-'` placeholder dropped, sorted for determinism.
    */
  def facilityDim(facilitiesRaw: DataFrame, fueltech: DataFrame): DataFrame = {
    val operatingUnits = operatingFacilities(facilitiesRaw)
      .select(
        col("code").as("facility_id"),
        col("name").as("facility_name"),
        col("location.lat").as("lat"),
        col("location.lng").as("lon"),
        col("network_region").as("region"),
        explode(filter(col("units"), u => u.getField("status_id") === "operating"))
          .as("unit"))
    operatingUnits
      .join(broadcast(fueltech), // 26-row taxonomy: always broadcast
        operatingUnits("unit.fueltech_id") === fueltech("fueltech_id"), "left")
      .groupBy("facility_id", "facility_name", "lat", "lon", "region")
      .agg(sort_array(array_remove(
        array_distinct(collect_list(col("label"))), "-")).as("fuel_tech"))
  }

  /** unit_code → facility_code map for the readings rollup (ref
    * extractor.py:85,113 — the dict the zip-join probes, J1). Returned as
    * a DataFrame: at scale this is a broadcast dim, not a driver map.
    */
  def unitToFacility(facilitiesRaw: DataFrame): DataFrame =
    operatingFacilities(facilitiesRaw)
      .select(col("code").as("facility_code"),
        explode(col("units")).as("unit"))
      .filter(col("unit.status_id") === "operating")
      .select(col("unit.code").as("unit_code"), col("facility_code"))

  /** Static region dimension (ref dashboard.py:236-245). */
  def regionDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Schemas.regions.toDF("region_id", "region_name")
  }
}

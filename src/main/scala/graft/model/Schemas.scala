package graft.model

import org.apache.spark.sql.types._

/** The six logical schemas of the reference pipeline (SURVEY §1.3,
  * FIXTURES.md §A), as explicit StructTypes — schema-on-read everywhere
  * (`from_json(col, schema)` replaces the reference's Pydantic models,
  * ref dashboard.py:312-322).
  */
object Schemas {

  /** Nested facility catalog (ref context.py:33-140, extractor.py:67-95). */
  val facilitiesRaw: StructType = StructType(Seq(
    StructField("code", StringType),
    StructField("name", StringType),
    StructField("network_id", StringType),
    StructField("network_region", StringType),
    StructField("description", StringType),
    StructField("location", StructType(Seq(
      StructField("lat", DoubleType),
      StructField("lng", DoubleType)))),
    StructField("units", ArrayType(StructType(Seq(
      StructField("code", StringType),
      StructField("fueltech_id", StringType),
      StructField("status_id", StringType),
      StructField("capacity_registered", DoubleType),
      StructField("capacity_maximum", DoubleType),
      StructField("capacity_storage", DoubleType),
      StructField("data_first_seen", StringType),
      StructField("data_last_seen", StringType),
      StructField("dispatch_type", StringType),
      StructField("created_at", StringType),
      StructField("updated_at", StringType)))))))

  /** Fueltech taxonomy row (ref context.py:4-31). */
  val fueltech: StructType = StructType(Seq(
    StructField("fueltech_id", StringType),
    StructField("label", StringType),
    StructField("renewable", BooleanType)))

  /** Facility dimension (ref data/facility_lookup.csv, extractor.py:88-95). */
  val facilityLookup: StructType = StructType(Seq(
    StructField("facility_id", StringType),
    StructField("facility_name", StringType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("region", StringType),
    StructField("fuel_tech", ArrayType(StringType))))

  /** Long per-unit readings (ref extractor.py:229-235). */
  val unitReading: StructType = StructType(Seq(
    StructField("unit_code", StringType),
    StructField("timestamp", StringType), // ISO-8601 with offset, kept raw
    StructField("power", DoubleType),
    StructField("emission", DoubleType)))

  /** Long per-region market readings (ref extractor.py:251-288). */
  val marketReading: StructType = StructType(Seq(
    StructField("region_code", StringType),
    StructField("timestamp", StringType),
    StructField("price", DoubleType),
    StructField("demand", DoubleType)))

  /** Facility power/emissions event (ref readme.md:3-13, publisher.py:63-70). */
  val facilityEvent: StructType = StructType(Seq(
    StructField("facility_id", StringType),
    StructField("timestamp", StringType),
    StructField("power_mw", DoubleType),
    StructField("co2_tonnes", DoubleType)))

  /** Region price/demand event (ref readme.md:14-24, publisher.py:73-80). */
  val marketEvent: StructType = StructType(Seq(
    StructField("region_id", StringType),
    StructField("timestamp", StringType),
    StructField("price_dmwh", DoubleType),
    StructField("demand_mw", DoubleType)))

  /** The five NEM regions (ref dashboard.py:237-243, constants.py:4-10). */
  val regions: Seq[(String, String)] = Seq(
    "NSW1" -> "New South Wales", "QLD1" -> "Queensland",
    "VIC1" -> "Victoria", "SA1" -> "South Australia", "TAS1" -> "Tasmania")
}

/** Typed rows for Dataset APIs at module boundaries. */
object Rows {
  final case class UnitReading(unit_code: String, timestamp: String,
      power: Double, emission: Double)
  final case class FacilityReading(facility_id: String, timestamp: String,
      power: Double, emission: Double)
  final case class MarketReading(region_code: String, timestamp: String,
      price: Double, demand: Double)
  final case class FacilityEvent(facility_id: String, timestamp: String,
      power_mw: Double, co2_tonnes: Double)
  final case class MarketEvent(region_id: String, timestamp: String,
      price_dmwh: Double, demand_mw: Double)
}

package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readings ETL (ref extractor.py:192-288).
  *
  * The reference aligns power/emissions (and price/demand) by *positional
  * zip* with equality asserts (J3-J5); Spark-first, alignment is an
  * equi-join on the natural key — positional semantics never survive a
  * distributed shuffle, and the asserts become data-quality checks
  * ([[dqMisaligned]]) the caller can route to a rejects sink instead of
  * crashing the job.
  */
object Readings {

  /** Normalize one metric block — rows (unit_code, timestamp, value) from
    * the nested API shape `results[]{columns{unit_code}, data[[ts, v]]}`
    * (ref extractor.py:206-227).
    */
  def normalizeMetric(raw: DataFrame, key: String, valueName: String): DataFrame =
    raw.select(explode(col("results")).as("r"))
      .select(col(s"r.columns.$key").as(key), explode(col("r.data")).as("d"))
      .select(col(key),
        col("d").getItem(0).as("timestamp"),
        col("d").getItem(1).cast("double").as(valueName))

  /** Power ⋈ emissions on (unit_code, timestamp) — the distributed form of
    * the reference's double zip (J3+J4). Inner join: a reading exists when
    * both metrics do, mirroring zip semantics on aligned data.
    */
  def unitReadings(power: DataFrame, emissions: DataFrame): DataFrame =
    normalizeMetric(power, "unit_code", "power")
      .join(normalizeMetric(emissions, "unit_code", "emission"),
        Seq("unit_code", "timestamp"))

  /** Price ⋈ demand per region (J5), same pattern. */
  def marketReadings(price: DataFrame, demand: DataFrame): DataFrame =
    normalizeMetric(price, "region_code", "price")
      .join(normalizeMetric(demand, "region_code", "demand"),
        Seq("region_code", "timestamp"))

  /** DQ check replacing the reference's asserts (extractor.py:207-227):
    * readings present in exactly one of the two metric frames. Empty ⇒
    * the zip would have been aligned.
    */
  def dqMisaligned(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val left = a.select(keys.map(col): _*)
    val right = b.select(keys.map(col): _*)
    left.exceptAll(right).withColumn("missing_in", lit("right"))
      .unionByName(right.exceptAll(left).withColumn("missing_in", lit("left")))
  }

  /** Unit → facility rollup (ref extractor.py:230-246, J1+A1): broadcast
    * join against the unit dim (units not in the map are dropped — the
    * reference logs & skips them, J2; recover them via `left_anti` on the
    * same dim if a rejects channel is wanted), then sum per (facility, ts).
    */
  def facilityReadings(unitReadings: DataFrame, unitToFacility: DataFrame): DataFrame =
    unitReadings
      .join(broadcast(unitToFacility), Seq("unit_code"))
      .groupBy(col("facility_code"), col("timestamp"))
      .agg(sum(col("power")).as("power"), sum(col("emission")).as("emission"))
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import graft.model.Schemas

/** CSV cache + lookup persistence (ref S5/S6: extractor.py:108-110,308;
  * publisher.py:47; dashboard.py:247-251).
  *
  * The reference's interchange format is CSV with a JSON-encoded array
  * column (`fuel_tech`); Parquet is this engine's native store (columnar
  * encoding gives the ~75% redundancy win the reference hand-built with
  * its wide pivot, SURVEY §4) — CSV stays supported for compatibility
  * with reference consumers.
  */
object CsvCache {

  /** Facility lookup → CSV; the array column is JSON-encoded per row
    * (ref extractor.py:109, P19).
    */
  def writeLookup(dim: DataFrame, path: String): Unit =
    dim.withColumn("fuel_tech", to_json(col("fuel_tech")))
      .coalesce(1) // a ≤419-row dim — one file like the reference's
      .write.mode("overwrite").option("header", "true").csv(path)

  /** CSV → facility lookup with the JSON array parsed back
    * (ref dashboard.py:247-251).
    */
  def readLookup(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema("facility_id STRING, facility_name STRING, lat DOUBLE, " +
        "lon DOUBLE, region STRING, fuel_tech STRING")
      .csv(path)
      .withColumn("fuel_tech", from_json(col("fuel_tech"), ArrayType(StringType)))

  /** Wide consolidate cache → CSV, rows in timestamp order (the
    * pre-sorted-replay optimization the reference relies on, ref
    * extractor.py:302-308 + report "rows were already sorted").
    * coalesce(1) like [[writeLookup]]: a multi-file CSV write loses
    * global read-back order, and replay consumers depend on it. The wide
    * cache is one dashboard's worth of rows — single-file is the contract,
    * not a scale path.
    */
  def writeWide(wide: DataFrame, path: String): Unit =
    wide.coalesce(1).sortWithinPartitions("timestamp")
      .write.mode("overwrite").option("header", "true").csv(path)

  /** CSV → wide cache, schema-on-read: `timestamp` string + everything
    * else double, derived from the header (ref publisher.py:47-50 P7 —
    * column names carry the schema).
    */
  def readWide(spark: SparkSession, path: String): DataFrame = {
    val header = spark.read.option("header", "true").csv(path)
    val typed = header.columns.map {
      case "timestamp" => "timestamp STRING"
      case c => s"`$c` DOUBLE"
    }.mkString(", ")
    spark.read.option("header", "true").schema(typed).csv(path)
  }
}

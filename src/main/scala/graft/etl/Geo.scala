package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Geospatial region handling (ref constants.py:13-34 + dashboard.py:
  * 145-191). The reference never computes point-in-polygon — region
  * membership is a stored attribute, and the map layer only needs the
  * polygons of *selected* regions. So the operator is an attribute
  * semi-join (J11), not a spatial one; geometries stay opaque GeoJSON
  * strings the same way media payloads stay opaque binary.
  */
object Geo {

  /** ABS state name → NEM region id (ref constants.py:27-34; WA/NT/ACT
    * have no NEM region and are absent, so they drop in the join).
    */
  val stateToRegion: Map[String, String] = Map(
    "New South Wales" -> "NSW1",
    "Queensland" -> "QLD1",
    "Victoria" -> "VIC1",
    "South Australia" -> "SA1",
    "Tasmania" -> "TAS1")

  /** The features table: one row per GeoJSON feature. */
  def featureTable(spark: SparkSession,
      features: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    features.toDF("state_name", "geometry_json")
      .withColumn("region_id",
        element_at(typedLit(stateToRegion), col("state_name")))
  }

  /** Keep features whose region is selected (ref dashboard.py:160-166):
    * broadcast left-semi join; features of non-NEM states (null
    * region_id) never match, reproducing the reference's silent drop.
    */
  def selectFeatures(features: DataFrame, selected: DataFrame): DataFrame =
    features.join(broadcast(selected),
      features("region_id") === selected("region_id"), "left_semi")
}

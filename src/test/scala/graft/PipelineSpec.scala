package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.{Consolidate, FacilityCatalog, Readings}
import graft.stream.{Ingest, Melt, State}

/** SURVEY §7.2 flagship slice, end to end: raw nested facility JSON +
  * metric JSON → catalog → readings rollup → wide cache → melt to JSON
  * events → REPLAYED AS A STREAM → validate → broadcast-enrich →
  * region/fuel filter → watermarked 5-min totals, asserted against
  * hand-computed goldens. One of every operator family in SURVEY §2 in a
  * single flow, batch and streaming halves glued at the event boundary.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  val T1 = "2025-10-15T10:05:00+11:00" // 23:05Z prev day
  val T2 = "2025-10-15T10:10:00+11:00"
  val T3 = "2025-10-15T10:15:00+11:00"

  private def facilitiesRaw: DataFrame =
    spark.read.schema(graft.model.Schemas.facilitiesRaw).json(Seq(
      """{"code":"ALP","name":"Alpha","network_region":"NSW1","location":{"lat":-33.1,"lng":151.2},
         "units":[{"code":"ALP1","fueltech_id":"solar_utility","status_id":"operating"}]}""",
      """{"code":"BET","name":"Beta","network_region":"VIC1","location":{"lat":-37.8,"lng":144.9},
         "units":[{"code":"BET1","fueltech_id":"coal_black","status_id":"operating"}]}""").toDS())

  private def fueltech: DataFrame = Seq(
    ("solar_utility", "Solar (Utility)", true), ("coal_black", "Coal (Black)", false))
    .toDF("fueltech_id", "label", "renewable")

  private def metricJson(series: Seq[(String, Seq[(String, Double)])]): DataFrame = {
    val results = series.map { case (code, data) =>
      val pts = data.map { case (ts, v) => s"""["$ts",$v]""" }.mkString(",")
      s"""{"columns":{"unit_code":"$code"},"data":[$pts]}"""
    }.mkString(",")
    spark.read.json(Seq(s"""{"results":[$results]}""").toDS())
  }

  test("point-in-time lookup over the SCD2 history equals the as-of join " +
    "(interval containment vs nearest-prior — two formulations, one answer)") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("t_us"), col("event_type"))
    val hist = graft.ops.Scd.q54Scd2(spark, dir)

    // Formulation 1: interval containment (valid_from <= t < valid_to).
    val byInterval = ev.join(hist,
      ev("user_id") === hist("user_id") &&
        hist("valid_from") <= ev("t_us") &&
        (hist("valid_to").isNull || ev("t_us") < hist("valid_to")))
      .select(col("event_id"), col("status"))

    // Formulation 2: as-of (latest change at or before t).
    val byAsof = graft.ops.AsOf.asofJoin(
        ev, hist.select(col("user_id"), col("valid_from").as("t_us"),
          col("status")), "user_id", "t_us", "status")
      .filter(col("asof_status").isNotNull)
      .select(col("event_id"), col("asof_status").as("status"))

    assert(byInterval.count() == ev.count(), "intervals must tile the timeline")
    assert(byInterval.exceptAll(byAsof).isEmpty && byAsof.exceptAll(byInterval).isEmpty)
    // And the looked-up state at an event's own time is the event's type
    // (each change opens its own interval). Caveat: two different-type
    // events on one user in the SAME microsecond would break this (the
    // earlier one's interval is empty) — verified absent at every SF; if
    // a regenerated fixture trips here, that's the first thing to check.
    val mismatch = byInterval.join(ev, "event_id")
      .filter(col("status") =!= col("event_type")).count()
    assert(mismatch == 0)
  }

  test("dedup pipeline closure: pairs → clusters → keeper filter leaves no surviving pair") {
    // The curation flow the dedup operators exist for, composed end to
    // end on real fixture data: candidate pairs (d2) → transitive
    // clusters (d9) → drop every clustered non-keeper → the surviving
    // corpus generates ZERO candidate pairs. (Signatures are per-doc
    // functions, so pairs over survivors = original pairs restricted to
    // survivors, and each original pair lost at least one side.)
    val dir = "/root/testdata/sf0.001"
    val clusters = graft.ops.Dedup.d9DedupClusters(spark, dir)
    val docs = Tables.load(spark, dir, "documents")
    val survivors = docs.join(
      clusters.filter($"doc_id" =!= $"cluster_id").select("doc_id"),
      Seq("doc_id"), "left_anti")
    assert(survivors.count() < docs.count(), "fixtures contain near-dups")
    val pairs = graft.ops.Dedup.d2MinhashLsh(spark, dir)
      .join(survivors.select($"doc_id".as("doc_a")), Seq("doc_a"), "left_semi")
      .join(survivors.select($"doc_id".as("doc_b")), Seq("doc_b"), "left_semi")
    assert(pairs.count() == 0, "a candidate pair survived the keeper filter")
  }

  test("batch ETL → melt → stream ingest → enrich → filter → windowed totals") {
    // ---- batch half (ref extractor.py) ----
    val power = metricJson(Seq(
      "ALP1" -> Seq(T1 -> 10.0, T2 -> 11.0, T3 -> 12.0),
      "BET1" -> Seq(T1 -> 100.0, T2 -> 90.0, T3 -> 80.0)))
    val emissions = metricJson(Seq(
      "ALP1" -> Seq(T1 -> 0.0, T2 -> 0.0, T3 -> 0.0),
      "BET1" -> Seq(T1 -> 70.0, T2 -> 60.0, T3 -> 50.0)))
    val dim = FacilityCatalog.facilityDim(facilitiesRaw, fueltech)
    val fac = Readings.facilityReadings(
      Readings.unitReadings(power, emissions),
      FacilityCatalog.unitToFacility(facilitiesRaw))
    val wide = Consolidate.wideCache(
      Consolidate.pivotFacility(fac, Seq("ALP", "BET")),
      Consolidate.pivotMarket(
        Seq(("VIC1", T1, 92.1, 5000.0)).toDF("region_code", "timestamp", "price", "demand"),
        Seq("VIC1")))
    val eventJson = Melt.jsonStream(wide, Seq("ALP", "BET"), Seq("VIC1"))
      .as[String].collect() // test-only: hand the batch output to the stream

    // ---- streaming half (ref dashboard.py) ----
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val enriched = Ingest.enrichFacility(Ingest.facilityEvents(in.toDF()), dim)
    val vicCoal = enriched.filter(col("region") === "VIC1" &&
      arrays_overlap(col("fuel_tech"), array(lit("Coal (Black)"))))
    val q = State.windowedTotals(vicCoal, watermark = "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("pipe_t").start()
    try {
      in.addData(eventJson.toIndexedSeq)
      q.processAllAvailable()
      // Far-future sentinel advances the watermark so all real buckets close.
      in.addData(
        """{"facility_id":"BET","timestamp":"2025-10-15T13:00:00+11:00","power_mw":0,"co2_tonnes":0}""")
      q.processAllAvailable()
      val got = spark.table("pipe_t")
        .select(col("bucket_start").cast("string"), col("total_power_mw"), col("total_co2_tonnes"))
        .as[(String, Double, Double)].collect()
        .map { case (k, p, c) => k -> ((p, c)) }.toMap
      // Only BET (VIC1 + Coal) survives the filter; one bucket per 5-min ts.
      assert(got == Map(
        "2025-10-14 23:05:00" -> ((100.0, 70.0)),
        "2025-10-14 23:10:00" -> ((90.0, 60.0)),
        "2025-10-14 23:15:00" -> ((80.0, 50.0))))
    } finally q.stop()
  }
}

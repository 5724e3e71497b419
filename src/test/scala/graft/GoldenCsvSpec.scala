package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.Consolidate
import graft.sources.CsvCache

/** Byte-level golden for the wide-cache CSV (the reference's interchange
  * file): pins header layout, null encoding, float formatting, and row
  * order so format drift is caught, not discovered by a downstream
  * consumer.
  */
class GoldenCsvSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  test("wide cache CSV bytes match the golden") {
    val facilityLong = Seq(
      ("ALP", "2025-10-15T10:05:00+11:00", 10.0, 0.25),
      ("ALP", "2025-10-15T10:10:00+11:00", 12.5, 0.0),
      ("BET", "2025-10-15T10:05:00+11:00", 95.0, 80.5),
      ("BET", "2025-10-15T10:10:00+11:00", 90.0, 70.0))
      .toDF("facility_code", "timestamp", "power", "emission")
    val marketLong = Seq(
      ("VIC1", "2025-10-15T10:05:00+11:00", 92.1, 5000.0))
      .toDF("region_code", "timestamp", "price", "demand")
    val wide = Consolidate.wideCache(
      Consolidate.pivotFacility(facilityLong, Seq("ALP", "BET")),
      Consolidate.pivotMarket(marketLong, Seq("VIC1")))
    val out = Files.createTempDirectory("golden_csv").toString
    CsvCache.writeWide(wide.coalesce(1), out)
    val part = Files.list(Paths.get(out)).iterator().asScala
      .filter(_.toString.endsWith(".csv")).toSeq.head
    val got = Files.readString(part)
    val golden =
      """timestamp,power_ALP,emission_ALP,power_BET,emission_BET,price_VIC1,demand_VIC1
        |2025-10-15T10:05:00+11:00,10.0,0.25,95.0,80.5,92.1,5000.0
        |2025-10-15T10:10:00+11:00,12.5,0.0,90.0,70.0,,
        |""".stripMargin
    assert(got == golden, s"CSV format drifted:\n$got")
  }

  test("full extractor flow: staged batch files → catalog join → pivot → CSV bytes (A7)") {
    import spark.implicits._
    import graft.etl.{FacilityCatalog, Readings}

    // Staged per-batch API responses (ref extractor.py:98-105 S7), one
    // response line per file; numbering starts at 3 with a gap — batch_id
    // must come from the filename, not the dense file index.
    def respLine(series: Seq[(String, Seq[(String, Double)])]): String =
      series.map { case (code, data) =>
        val pts = data.map { case (ts, v) => s"""["$ts",$v]""" }.mkString(",")
        s"""{"columns":{"unit_code":"$code"},"data":[$pts]}"""
      }.mkString("""{"results":[""", ",", "]}")
    val t1 = "2025-10-15T10:05:00+11:00"
    val t2 = "2025-10-15T10:10:00+11:00"
    val powDir = Files.createTempDirectory("staged_pow")
    val emiDir = Files.createTempDirectory("staged_emi")
    Files.writeString(powDir.resolve("batch_3.json"),
      respLine(Seq("ALP1" -> Seq(t1 -> 10.0, t2 -> 12.5))) + "\n")
    Files.writeString(powDir.resolve("batch_7.json"),
      respLine(Seq("BET1" -> Seq(t1 -> 95.0, t2 -> 90.0))) + "\n")
    Files.writeString(emiDir.resolve("batch_3.json"),
      respLine(Seq("ALP1" -> Seq(t1 -> 0.25, t2 -> 0.0))) + "\n")
    Files.writeString(emiDir.resolve("batch_7.json"),
      respLine(Seq("BET1" -> Seq(t1 -> 80.5, t2 -> 70.0))) + "\n")

    def staged(dir: java.nio.file.Path) = {
      val df = spark.read.format("batched-json").load(dir.toString)
      assert(df.select($"batch_id").distinct().as[Long].collect().sorted.toSeq
        == Seq(3L, 7L), "batch_id must be the filename's number")
      spark.read.json(df.select($"value").as[String])
    }
    val facilitiesRaw = spark.read.schema(graft.model.Schemas.facilitiesRaw).json(Seq(
      """{"code":"ALP","name":"Alpha","network_region":"NSW1",
         "units":[{"code":"ALP1","fueltech_id":"solar_utility","status_id":"operating"}]}""",
      """{"code":"BET","name":"Beta","network_region":"VIC1",
         "units":[{"code":"BET1","fueltech_id":"coal_black","status_id":"operating"}]}""").toDS())
    val fac = Readings.facilityReadings(
      Readings.unitReadings(staged(powDir), staged(emiDir)),
      FacilityCatalog.unitToFacility(facilitiesRaw))
    val wide = Consolidate.wideCache(
      Consolidate.pivotFacility(fac, Seq("ALP", "BET")),
      Consolidate.pivotMarket(
        Seq(("VIC1", t1, 92.1, 5000.0)).toDF("region_code", "timestamp", "price", "demand"),
        Seq("VIC1")))
    val out = Files.createTempDirectory("golden_e2e").toString
    CsvCache.writeWide(wide, out)
    val part = Files.list(Paths.get(out)).iterator().asScala
      .filter(_.toString.endsWith(".csv")).toSeq.head
    val golden =
      """timestamp,power_ALP,emission_ALP,power_BET,emission_BET,price_VIC1,demand_VIC1
        |2025-10-15T10:05:00+11:00,10.0,0.25,95.0,80.5,92.1,5000.0
        |2025-10-15T10:10:00+11:00,12.5,0.0,90.0,70.0,,
        |""".stripMargin
    assert(Files.readString(part) == golden,
      s"end-to-end CSV drifted:\n${Files.readString(part)}")
  }
}

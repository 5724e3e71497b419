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
}

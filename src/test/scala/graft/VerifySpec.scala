package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Verify's failure channel: a throwing query must leave a LOUD marker
  * (empty output dir => the driver compare prints a FAIL row), never a
  * silent absence. Round-5 lesson: 9 broken queries shipped with zero
  * red rows because failures only went to stderr.
  */
class VerifySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session

  test("dumpOne on a throwing query leaves an empty dir and returns the error") {
    val out = Files.createTempDirectory("verify-spec").toString
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("deliberate failure")
    val err = Verify.dumpOne(spark, "/nonexistent", out, "broken_query", boom)
    assert(err.exists(_.contains("deliberate failure")))
    val dir = new java.io.File(s"$out/broken_query")
    assert(dir.isDirectory, "failed query must still leave its output dir")
    assert(Option(dir.listFiles).getOrElse(Array.empty).isEmpty,
      "failed query dir must be EMPTY so check.py reports 'no parquet output'")
  }

  test("dumpOne scrubs partial write debris before leaving the marker") {
    val out = Files.createTempDirectory("verify-spec").toString
    // A query that fails AT WRITE TIME (analysis passes, execution
    // throws) can leave _temporary/ partial files behind; those would
    // read as a (corrupt) result instead of a loud absence.
    val failsLate: (SparkSession, String) => DataFrame = (s, _) => {
      import s.implicits._
      Seq(1, 2, 3).toDF("x")
        .selectExpr("assert_true(x < 2) as guard", "x")
    }
    val err = Verify.dumpOne(spark, "unused", out, "late_fail", failsLate)
    assert(err.isDefined)
    val dir = new java.io.File(s"$out/late_fail")
    assert(dir.isDirectory &&
      Option(dir.listFiles).getOrElse(Array.empty).isEmpty)
  }

  test("dumpOne on a working query writes parquet and returns None") {
    val out = Files.createTempDirectory("verify-spec").toString
    val ok: (SparkSession, String) => DataFrame = (s, _) => {
      import s.implicits._
      Seq((1, "a"), (2, "b")).toDF("id", "v")
    }
    assert(Verify.dumpOne(spark, "unused", out, "good_query", ok).isEmpty)
    val files = new java.io.File(s"$out/good_query")
      .listFiles.filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    assert(spark.read.parquet(s"$out/good_query").count() == 2)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.JsonNormalize

/** Purpose-built nested fixtures (the testdata carries no nested-JSON
  * column, so an oracled query would be vacuous — the d10 lesson): the
  * fixture goes through a tmp parquet round trip so inference runs over
  * a real scan, not a LocalRelation.
  */
class JsonNormalizeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def nestedFixture(): org.apache.spark.sql.DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("jsonnorm").toString
    Seq(
      (1L, """{"a": 1, "b": {"c": "x", "d": {"e": 2.5}}, "tags": ["t1", "t2"],
              "items": [{"sku": "s1", "qty": 2}, {"sku": "s2", "qty": 1}]}"""),
      // drifted payload: extra b.g, missing b.d, empty items
      (2L, """{"a": 2, "b": {"c": "y", "g": true}, "tags": [], "items": []}"""),
      (3L, """{"a": 3}""")) // minimal payload: everything else absent
      .toDF("doc_id", "payload")
      .write.mode("overwrite").parquet(s"$tmp/raw")
    spark.read.parquet(s"$tmp/raw")
  }

  test("infer → decode → flatten: nested structs become dotted columns, drift unions") {
    val out = JsonNormalize.normalize(nestedFixture(), "payload")
    val names = out.columns.toSet
    assert(names == Set("doc_id", "payload_a", "payload_b_c", "payload_b_d_e",
      "payload_b_g", "payload_tags", "payload_items"),
      s"flattened columns: $names")
    val rows = out.orderBy("doc_id").collect()
    assert(rows(0).getAs[Long]("payload_a") == 1L)
    assert(rows(0).getAs[Double]("payload_b_d_e") == 2.5)
    assert(rows(0).getAs[scala.collection.Seq[String]]("payload_tags").toSeq
      == Seq("t1", "t2"))
    // drift: b.g only in row 2, b.d.e null there; row 3 all-null but present
    assert(rows(1).getAs[Boolean]("payload_b_g") == true)
    assert(rows(1).isNullAt(rows(1).fieldIndex("payload_b_d_e")))
    assert(rows(2).isNullAt(rows(2).fieldIndex("payload_b_c")))
  }

  test("explodeArray on array-of-structs flattens elements; outer keeps empty rows") {
    val out = JsonNormalize.explodeArray(
      JsonNormalize.normalize(nestedFixture(), "payload"), "payload_items")
    assert(out.columns.toSet.contains("payload_items_sku"))
    val skus = out.select("doc_id", "payload_items_sku")
      .as[(Long, Option[String])].collect().toSet
    assert(skus == Set((1L, Some("s1")), (1L, Some("s2")),
      (2L, None), (3L, None)),
      s"doc 1 explodes to 2 rows, empty/absent arrays keep one null row: $skus")
  }

  test("null payloads survive: skipped by inference, decoded to null row") {
    val tmp = java.nio.file.Files.createTempDirectory("jsonnull").toString
    Seq((1L, """{"a": 1}"""), (2L, null: String))
      .toDF("doc_id", "payload")
      .write.mode("overwrite").parquet(s"$tmp/raw")
    val out = JsonNormalize.normalize(spark.read.parquet(s"$tmp/raw"), "payload")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("payload_a") == 1L)
    assert(out(1).isNullAt(out(1).fieldIndex("payload_a")),
      "null payload must flatten to null fields, not fail inference")
  }

  test("scalar-array explode passes through; flatten is a no-op on flat frames") {
    val flatIn = Seq((1L, "x")).toDF("id", "v")
    assert(JsonNormalize.flatten(flatIn).columns.toSeq == Seq("id", "v"))
    val tags = JsonNormalize.explodeArray(
      JsonNormalize.normalize(nestedFixture(), "payload"), "payload_tags")
    val t = tags.filter($"doc_id" === 1L)
      .select("payload_tags").as[String].collect().toSet
    assert(t == Set("t1", "t2"))
  }
}

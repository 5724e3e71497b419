package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AsOf

class AsOfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  test("asofJoin: nearest prior value per key, inclusive tie, null when none") {
    val left = Seq(
      (1L, 10L, "a"), // before any right row → null
      (1L, 20L, "b"), // right row at exactly 20 matches (inclusive)
      (1L, 35L, "c"), // picks 30, not 20
      (2L, 50L, "d")) // other key: only key-2 rights considered
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 20L, 2.0), (1L, 30L, 3.0), (1L, 99L, 9.9), // 99 is after all lefts
      (2L, 49L, 4.9))
      .toDF("k", "ts", "v")
    val got = AsOf.asofJoin(left, right, "k", "ts", "v")
      .select($"tag", $"asof_v").as[(String, Option[Double])]
      .collect().toMap
    assert(got == Map("a" -> None, "b" -> Some(2.0), "c" -> Some(3.0), "d" -> Some(4.9)))
  }

  test("asofJoin keeps every left row and all its columns") {
    val left = Seq((1L, 5L, "x", 42)).toDF("k", "ts", "tag", "extra")
    val right = Seq((9L, 1L, 1.0)).toDF("k", "ts", "v")
    val got = AsOf.asofJoin(left, right, "k", "ts", "v")
    assert(got.columns.toSeq == Seq("k", "ts", "tag", "extra", "asof_v"))
    assert(got.count() == 1)
  }
}

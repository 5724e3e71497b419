package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Skew

/** Salted join/agg must be result-identical to the direct forms — the
  * salt only reshapes the shuffle.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val dir = "/root/testdata/sf0.001"

  test("saltedJoin == plain join (orders ⋈ customer, salt 8)") {
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_custkey").as("k"), col("o_totalprice"))
    val c = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("k"), col("c_mktsegment"))
    val plain = o.join(c, Seq("k"))
    val salted = Skew.saltedJoin(o, c, "k", salt = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin preserves left-join unmatched rows") {
    val o = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("k"), col("c_name"))
    val hi = Tables.load(spark, dir, "orders")
      .filter(col("o_totalprice") > 300000)
      .select(col("o_custkey").as("k"), col("o_totalprice"))
    val plain = o.join(hi, Seq("k"), "left_outer")
    val salted = Skew.saltedJoin(o, hi, "k", 4, "left_outer")
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin rejects outer-preserving joins of the replicated side") {
    val a = Tables.load(spark, dir, "orders").select(col("o_custkey").as("k"))
    val b = Tables.load(spark, dir, "customer").select(col("c_custkey").as("k"))
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(a, b, "k", 4, "right_outer")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(a, b, "k", 4, "full_outer")
    }
  }

  test("saltedSum == direct groupBy sum") {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag").as("k"), col("l_quantity"), col("l_extendedprice"))
    val direct = li.groupBy("k")
      .agg(sum("l_quantity").as("sum_l_quantity"),
        sum("l_extendedprice").as("sum_l_extendedprice"))
    val salted = Skew.saltedSum(li, "k", 16, Seq("l_quantity", "l_extendedprice"))
    // Compare after rounding: double sums associate differently per shape.
    val r = (d: org.apache.spark.sql.DataFrame) => d.select(col("k"),
      round(col("sum_l_quantity"), 6).as("a"), round(col("sum_l_extendedprice"), 6).as("b"))
    assert(r(salted).exceptAll(r(direct)).count() == 0)
    assert(r(direct).exceptAll(r(salted)).count() == 0)
  }
}

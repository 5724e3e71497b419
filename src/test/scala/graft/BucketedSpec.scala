package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Bucketed

/** Bucketed tables must make the fact-fact join exchange-free: both
  * sides pre-shuffled at write time, join reads co-located buckets.
  */
class BucketedSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val dir = "/root/testdata/sf0.001"

  test("join of two tables bucketed on the key plans without any Exchange") {
    val base = Files.createTempDirectory("bucketed").toString
    Bucketed.write(Tables.load(spark, dir, "lineitem"),
      "li_b", s"$base/li", "l_orderkey", 8)
    Bucketed.write(
      Tables.load(spark, dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey"),
      "ord_b", s"$base/ord", "l_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Force a non-broadcast join so the exchange question is real.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), Seq("l_orderkey"))
        .groupBy("l_orderkey")
        .agg(sum("l_quantity").as("q"), first("o_totalprice").as("p"))
      val plan = joined.queryExecution.explainString(FormattedMode)
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      assert(!plan.contains("- Exchange"),
        s"bucketed join still shuffles:\n${plan.take(1200)}")
      val expected = Tables.load(spark, dir, "lineitem")
        .join(Tables.load(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey").distinct().count()
      assert(joined.count() == expected) // same result as the unbucketed join
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Bucketed.drop(spark, "li_b")
      Bucketed.drop(spark, "ord_b")
    }
  }

  test("mismatched bucket counts fall back to a correct join (no silent wrong answers)") {
    val base = Files.createTempDirectory("bucketed2").toString
    Bucketed.write(
      Tables.load(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
      "ord_b8", s"$base/o8", "o_custkey", 8)
    Bucketed.write(
      Tables.load(spark, dir, "customer").select(col("c_custkey")),
      "cust_b4", s"$base/c4", "c_custkey", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // 8 vs 4 buckets: Spark shuffles one side or coalesces buckets —
      // either way the join result must match the plain shuffled join.
      val joined = spark.table("ord_b8")
        .join(spark.table("cust_b4"), col("o_custkey") === col("c_custkey"))
      val plain = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.load(spark, dir, "customer").select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"))
      assert(joined.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Bucketed.drop(spark, "ord_b8")
      Bucketed.drop(spark, "cust_b4")
    }
  }
}

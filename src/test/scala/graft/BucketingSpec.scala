package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-table co-located joins: the storage-layout half of shuffle
  * elimination. Both sides bucketed on the join key with the same count
  * ⇒ the join plans with ZERO exchanges (each bucket pair merges
  * directly); results must equal the plain shuffled join exactly.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val dir = "/root/testdata/sf0.001"

  test("same-key same-count buckets join with no exchange; results match the shuffled join") {
    val tmp = java.nio.file.Files.createTempDirectory("buckets").toString
    val bcastKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevBcast = spark.conf.get(bcastKey)
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_customer")
    try {
      // Force the join to actually need co-location: without this the
      // tiny fixture dims would broadcast and prove nothing.
      spark.conf.set(bcastKey, "-1")
      Tables.writeBucketed(
        Tables.load(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        "bkt_orders", s"$tmp/orders", buckets = 8, key = "o_custkey")
      Tables.writeBucketed(
        Tables.load(spark, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
        "bkt_customer", s"$tmp/customer", buckets = 8, key = "c_custkey")
      val joined = spark.table("bkt_orders")
        .join(spark.table("bkt_customer"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.explainString(FormattedMode)
      assert(!plan.contains("- Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(1200)}")
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      assert("Bucketed: true".r.findAllIn(plan).length == 2,
        s"both scans must read bucketed:\n$plan")
      // Same rows as the plain shuffled join over the raw parquet.
      val plain = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .join(Tables.load(spark, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
      assert(joined.count() == plain.count())
      assert(joined.exceptAll(plain).count() == 0)
      assert(plain.exceptAll(joined).count() == 0)
      // The bucket key's groupBy skips its shuffle too (aggregation
      // reuses the bucketing as its required distribution).
      val aggPlan = spark.table("bkt_orders")
        .groupBy("o_custkey").agg(sum("o_totalprice"))
        .queryExecution.explainString(FormattedMode)
      assert(!aggPlan.contains("- Exchange"),
        s"bucketed groupBy must not shuffle:\n${aggPlan.take(1200)}")
    } finally {
      spark.conf.set(bcastKey, prevBcast)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_customer")
    }
  }

  test("mismatched bucket counts fall back to a shuffled join (no silent wrong answers)") {
    val tmp = java.nio.file.Files.createTempDirectory("buckets2").toString
    val bcastKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevBcast = spark.conf.get(bcastKey)
    spark.sql("DROP TABLE IF EXISTS bkt_o8")
    spark.sql("DROP TABLE IF EXISTS bkt_c4")
    try {
      spark.conf.set(bcastKey, "-1")
      Tables.writeBucketed(
        Tables.load(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        "bkt_o8", s"$tmp/o8", buckets = 8, key = "o_custkey")
      Tables.writeBucketed(
        Tables.load(spark, dir, "customer").select(col("c_custkey")),
        "bkt_c4", s"$tmp/c4", buckets = 4, key = "c_custkey")
      val joined = spark.table("bkt_o8")
        .join(spark.table("bkt_c4"), col("o_custkey") === col("c_custkey"))
      // 8 vs 4 buckets: Spark either shuffles one side or coalesces
      // buckets — either way the answer stays right.
      val plain = Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.load(spark, dir, "customer").select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"))
      assert(joined.count() == plain.count())
    } finally {
      spark.conf.set(bcastKey, prevBcast)
      spark.sql("DROP TABLE IF EXISTS bkt_o8")
      spark.sql("DROP TABLE IF EXISTS bkt_c4")
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition pruning on Hive-style layouts: a filter on the partition
  * column must resolve at planning time (PartitionFilters on the scan)
  * — excluded partitions cost zero I/O, the property that lets a
  * 100 TB time-partitioned table answer a one-day query by reading one
  * day.
  */
class PartitioningSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._
  val dir = "/root/testdata/sf0.001"

  test("partition filter prunes directories at plan time; results match unpartitioned") {
    val tmp = java.nio.file.Files.createTempDirectory("partedw").toString
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
    Tables.writePartitioned(orders, s"$tmp/orders", "o_orderpriority")
    // One directory per priority value on disk.
    val parts = new java.io.File(s"$tmp/orders").listFiles()
      .filter(_.getName.startsWith("o_orderpriority=")).map(_.getName).sorted
    assert(parts.length == 5, s"5 priority partitions expected: ${parts.toSeq}")
    val parted = spark.read.parquet(s"$tmp/orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val plan = parted.queryExecution.explainString(FormattedMode)
    val pf = plan.linesIterator.find(_.trim.startsWith("PartitionFilters:"))
    assert(pf.exists(_.contains("o_orderpriority")),
      s"partition filter must resolve at plan time:\n$plan")
    // The pruned filter must NOT appear as a data filter / pushed filter
    // — it never reaches row-level evaluation at all.
    assert(plan.linesIterator.find(_.trim.startsWith("PushedFilters:"))
      .forall(!_.contains("o_orderpriority")), s"should prune, not push:\n$plan")
    // Same rows as filtering the unpartitioned table.
    val expected = orders.filter(col("o_orderpriority") === "1-URGENT")
    assert(parted.count() == expected.count() && parted.count() > 0)
    assert(parted.exceptAll(expected).count() == 0)
  }

  test("partition column round-trips through the directory encoding (spaces, dashes)") {
    val tmp = java.nio.file.Files.createTempDirectory("partedv").toString
    // Values with URL-encodable characters must survive dir-name encoding.
    val df = Seq((1L, "a b/c"), (2L, "plain"), (3L, "a b/c"))
      .toDF("id", "k")
    Tables.writePartitioned(df, s"$tmp/t", "k")
    val back = spark.read.parquet(s"$tmp/t")
    assert(back.filter($"k" === "a b/c").select("id").as[Long].collect().toSet
      == Set(1L, 3L))
    assert(back.count() == 3)
  }
}

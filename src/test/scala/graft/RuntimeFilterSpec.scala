package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime Bloom-filter join pruning: on a selective fact-fact join the
  * optimizer injects a bloom filter built from the selective side into
  * the probe side's scan — at 100 TB this is the difference between
  * shuffling the whole fact table and shuffling the ~matching fraction.
  * Thresholds are lowered here because testdata is tiny; at real scale
  * the defaults (10 MB build side) trigger on their own.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val dir = "/root/testdata/sf0.001"

  test("selective join injects a bloom filter into the probe side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = Tables.load(spark, dir, "lineitem")
      val hi = Tables.load(spark, dir, "orders")
        .filter(col("o_totalprice") > 450000) // selective build side
      val joined = li.join(hi, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("bloomfilter"),
        s"no bloom filter injected:\n${plan.take(1500)}")
      assert(joined.count() > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered query runs on sf0.001 and its oracle (when
  * declared) exists. Value-level correctness is covered by the DuckDB
  * oracle gate (tools/check.py mirrors the driver); per-operator unit
  * specs live next to their modules.
  */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("oracleSql keys are a subset of queries") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracleSql without query impl: $extra")
  }

  test("q35: GK percentile sketch stays within 1% of exact percentiles") {
    import org.apache.spark.sql.functions._
    val approx = SparkEntry.queries("q35_approx_percentile")(spark, dir)
    val exact = Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("e50"),
        expr("percentile(l_extendedprice, 0.95)").as("e95"))
    approx.join(exact, "l_returnflag").collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("ap50") - r.getAs[Double]("e50"))
        / r.getAs[Double]("e50") <= 0.01)
      assert(math.abs(r.getAs[Double]("ap95") - r.getAs[Double]("e95"))
        / r.getAs[Double]("e95") <= 0.01)
    }
  }

  test("q30: HLL estimates stay within 2% of exact distinct counts") {
    import org.apache.spark.sql.functions._
    val approx = SparkEntry.queries("q30_approx_distinct")(spark, dir)
    val exact = Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
    val joined = approx.join(exact, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (ap, ep) = (r.getAs[Long]("approx_parts"), r.getAs[Long]("exact_parts"))
      val (ao, eo) = (r.getAs[Long]("approx_orders"), r.getAs[Long]("exact_orders"))
      assert(math.abs(ap - ep).toDouble / ep <= 0.02, s"parts: $ap vs $ep")
      assert(math.abs(ao - eo).toDouble / eo <= 0.02, s"orders: $ao vs $eo")
    }
  }
}

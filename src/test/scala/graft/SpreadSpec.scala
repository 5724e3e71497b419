package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Tables.spread's FileIndex-metadata probe (round-5 replacement for the
  * df.rdd probe, which built the physical plan twice per call): fires on
  * under-split scans, self-disables once the layout already carries
  * enough splits, and passes non-file frames through untouched. The
  * self-disable case is the one the single-row-group driver fixtures
  * could never exercise (NOTES r3/r4 item) — here the multi-file corpus
  * is constructed, and at sf1 the measured behavior is recorded in
  * SCALE.md.
  */
class SpreadSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  test("spread fires on a single-file under-split scan (round-robin to cores)") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = Tables.spread(df)
    assert(out ne df, "under-split scan must be repartitioned")
    assert(out.queryExecution.analyzed.toString.contains("Repartition"))
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("spread self-disables when the file layout already has enough splits") {
    // 8 files; with openCost padding each packs into its own split, so
    // the probe sees splits >= cores/2 and the repartition would be pure
    // loss — the exact regime of a real multi-row-group corpus.
    val dir = Files.createTempDirectory("spread-multi").toString
    (1L to 4000L).map(i => (i, s"text for document number $i"))
      .toDF("doc_id", "text")
      .repartition(8)
      .write.parquet(s"$dir/docs")
    val df = spark.read.parquet(s"$dir/docs")
    assert(Tables.spread(df) eq df,
      "adequately-split scan must pass through untouched")
  }

  test("spread passes non-file frames through (no relation to probe)") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(Tables.spread(df) eq df)
  }
}

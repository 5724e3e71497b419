package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Compact

/** Small-file compaction: byte-sized output planning, content
  * preservation, and the no-upsize coalesce edge.
  */
class CompactSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val dir = "/root/testdata/sf0.001"

  private def parquetFiles(path: String): Array[java.io.File] =
    new java.io.File(path).listFiles((_, n) => n.endsWith(".parquet"))

  test("compact merges a many-small-file layout into ~targetBytes files, content intact") {
    val tmp = Files.createTempDirectory("compact").toString
    val docs = Tables.load(spark, dir, "documents")
    docs.repartition(40).write.parquet(s"$tmp/small")
    val smallFiles = parquetFiles(s"$tmp/small")
    assert(smallFiles.length == 40)
    val totalBytes = smallFiles.map(_.length).sum

    // Target a quarter of the input: expect ceil(total/target) = 4 files.
    val n = Compact.compact(spark, s"$tmp/small", s"$tmp/big", totalBytes / 4 + 1)
    assert(n == 4)
    assert(parquetFiles(s"$tmp/big").length == 4)

    // Content identical, not just row-count equal.
    val before = docs.agg(count(lit(1)), sum(col("doc_id")), sum(col("n_chars")))
      .collect()(0)
    val after = spark.read.parquet(s"$tmp/big")
      .agg(count(lit(1)), sum(col("doc_id")), sum(col("n_chars"))).collect()(0)
    assert(before == after)
  }

  test("compact never up-splits: a target smaller than one input split still writes what coalesce can") {
    val tmp = Files.createTempDirectory("compact2").toString
    Tables.load(spark, dir, "documents").coalesce(1).write.parquet(s"$tmp/one")
    // Tiny target asks for many files, but coalesce cannot exceed the
    // input split count — compaction must never turn into a re-split,
    // and the RETURN value must report what was written, not the plan.
    val n = Compact.compact(spark, s"$tmp/one", s"$tmp/out", 1024)
    assert(n == 1)
    assert(parquetFiles(s"$tmp/out").length == 1)
  }
}

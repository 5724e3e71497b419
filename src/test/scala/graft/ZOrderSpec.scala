package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ZOrder

/** Z-order clustering: Morton-code correctness against an in-memory bit
  * interleave, and the layout property that justifies it — files cover
  * bounded ranges of BOTH dimensions, so single-dimension predicates
  * can skip files that a one-column sort layout must always read.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._
  val dir = "/root/testdata/sf0.001"

  private def mortonRef(x: Long, y: Long): Long =
    (0 until 16).map(i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum

  test("zValue equals the reference bit interleave across the 16-bit domain") {
    val pairs = Seq.tabulate(512)(i => (i * 131L % 65536, i * 37L % 65536)) ++
      Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    for ((x, y, z) <- got) assert(z == mortonRef(x, y), s"($x, $y)")
  }

  test("clusterWrite on an empty frame writes the empty dataset instead of NPE-ing on null bounds") {
    val tmp = Files.createTempDirectory("zorder-empty").toString
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    ZOrder.clusterWrite(empty, s"$tmp/out", "a", "b", 4)
    val got = spark.read.parquet(s"$tmp/out")
    assert(got.count() == 0 && got.columns.toSeq == Seq("a", "b"))
  }

  test("clusterWrite with one all-null dimension writes unclustered instead of NPE-ing") {
    val tmp = Files.createTempDirectory("zorder-nulldim").toString
    // d2 entirely null while d1 is not: min(d1) passes a slot-0-only
    // guard, then getLong on d2's null bound would NPE (ADVICE r4).
    val df = Seq((1L, Option.empty[Long]), (2L, Option.empty[Long]))
      .toDF("a", "b")
    ZOrder.clusterWrite(df, s"$tmp/out", "a", "b", 4)
    assert(spark.read.parquet(s"$tmp/out").count() == 2)
    // And the mirror case: d1 all-null, d2 populated — same fallback.
    val df2 = Seq((Option.empty[Long], 1L), (Option.empty[Long], 2L))
      .toDF("a", "b")
    ZOrder.clusterWrite(df2, s"$tmp/out2", "a", "b", 4)
    assert(spark.read.parquet(s"$tmp/out2").count() == 2)
  }

  /** Per-file [min,max] of a column for every parquet file in `path`. */
  private def fileRanges(df: DataFrame, c: String): Array[(Long, Long)] =
    df.groupBy(input_file_name()).agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
      .select("lo", "hi").as[(Long, Long)].collect()

  test("clustered files bound both dimensions; a user-id predicate skips files " +
    "that a ts-sorted layout always scans") {
    val tmp = Files.createTempDirectory("zorder").toString
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("value"))

    ZOrder.clusterWrite(ev, s"$tmp/z", "user_id", "ts", 8)
    // Baseline: the same data laid out by a plain time sort.
    ev.repartitionByRange(8, col("ts")).sortWithinPartitions("ts")
      .write.parquet(s"$tmp/t")

    val zdf = spark.read.parquet(s"$tmp/z")
    val tdf = spark.read.parquet(s"$tmp/t")
    assert(zdf.count() == ev.count())

    val users = Seq(2L, 7L, 12L)
    def touched(ranges: Array[(Long, Long)], v: Long): Int =
      ranges.count { case (lo, hi) => lo <= v && v <= hi }

    val zu = fileRanges(zdf, "user_id")
    val tu = fileRanges(tdf, "user_id")
    // Measured on the fixture: z touches 4-6 of 8 files per user; the
    // ts-sorted layout has every file spanning every user (8/8 always).
    for (u <- users) {
      assert(touched(tu, u) == tu.length,
        s"baseline should be skip-free for user $u")
      assert(touched(zu, u) <= 6,
        s"user $u: z-order skipped nothing (${touched(zu, u)}/${zu.length})")
    }
    // The other side of the trade: ts locality is diluted but bounded —
    // each file still covers at most ~half the time range (a pure ts
    // sort gives 1/8; measured z spans were 0.24-0.50).
    val zts = fileRanges(zdf, "ts")
    val (tsLo, tsHi) = (zts.map(_._1).min, zts.map(_._2).max)
    val spans = zts.map(r => (r._2 - r._1).toDouble / (tsHi - tsLo))
    assert(spans.forall(_ <= 0.55), s"ts locality lost: ${spans.toSeq.sorted}")
  }
}

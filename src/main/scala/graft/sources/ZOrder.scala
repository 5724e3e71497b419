package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data layout —
  * the write-side complement to Bucketed (join co-location) and
  * Tables.writePartitioned (directory pruning). A single-column sort
  * gives perfect file locality on ONE predicate dimension and none on
  * any other; interleaving the bits of two bucketized dimensions makes
  * every file cover a small RECTANGLE in (d1, d2) space, so parquet
  * min/max row-group stats can skip files for predicates on EITHER
  * dimension (Delta/Iceberg `OPTIMIZE ZORDER BY`, made of plain Spark
  * parts). At 100 TB the skipped-file fraction is the query time.
  *
  * All column math is built-in bitwise ops (shiftleft/or/and on longs) —
  * the magic-mask spread is 4 shift+mask steps per dimension, stays
  * inside whole-stage codegen, and needs no custom Expression (the
  * preference order's case (a): compose existing ops when semantics
  * allow — unlike cosine/sq_dist there is no per-row loop here).
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to even bit positions (0,2,…,30). */
  private def spread16(c: Column): Column = {
    val s8 = (c.bitwiseOR(shiftleft(c, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s4 = (s8.bitwiseOR(shiftleft(s8, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s2 = (s4.bitwiseOR(shiftleft(s4, 2))).bitwiseAND(lit(0x33333333L))
    (s2.bitwiseOR(shiftleft(s2, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit values (x even bits, y odd). */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Bucketize `(col − min)` into the FULL 16-bit grid. Filling all 16
    * bits matters: interleaving only works if both dimensions carry
    * significant HIGH bits — a 4-bit user-id domain mapped to buckets
    * 0..14 would sit entirely in z's low bits and the "z-order" would
    * degenerate to a plain sort on the other dimension. Two exact
    * integer strategies, chosen by span:
    *  - span < 2^46: multiply-first `(c-min)*65535 div span` — exact
    *    full-range scaling, and 65535·2^46 can't overflow long;
    *  - larger spans (epoch-nanos ~2^51): divide-first by
    *    `(span >>> 16) + 1` — still reaches buckets ≥ 32768, and the
    *    multiply would overflow.
    */
  private def bucketExpr(d: String, min: Long, max: Long): Column = {
    // `d` is always one of clusterWrite's internal `_zx`/`_zy` aliases —
    // never a caller-supplied name, which could need backticks (or worse,
    // reparse as a different expression) inside this SQL string.
    val span = max - min
    if (span == 0L) lit(0L)
    else if (span < (1L << 46)) expr(s"(($d - ${min}L) * 65535L) div ${span}L")
    else expr(s"($d - ${min}L) div ${(span >>> 16) + 1}L")
  }

  /** Cluster-write `df` by the z-curve over long columns (d1, d2) into
    * `numFiles` range partitions, each sorted by z — files then hold
    * compact rectangles of (d1, d2) space. The two min/max pairs are one
    * tiny driver-side agg (4 longs — not a hot-path collect); at scale
    * reuse known domain bounds instead.
    */
  def clusterWrite(df: DataFrame, path: String, d1: String, d2: String,
      numFiles: Int): Unit = {
    val Array(r) = df
      .agg(count(lit(1)), min(col(d1)), max(col(d1)), min(col(d2)), max(col(d2)))
      .collect()
    if ((1 to 4).exists(r.isNullAt)) {
      // ANY null bound — empty input, or a dimension that is entirely
      // null (min/max skip nulls, so d2 can be all-null while d1 is
      // not): there is no rectangle to interleave, so write unclustered
      // instead of NPE-ing on getLong. All four slots are checked — a
      // guard on slot 0 alone would pass a null-d2 frame through.
      if (r.getLong(0) > 0)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"clusterWrite: null min/max bound on '$d1' or '$d2' " +
            "(all-null dimension) — writing unclustered")
      df.write.mode("overwrite").parquet(path)
      return
    }
    df.withColumn("_zx", col(d1)).withColumn("_zy", col(d2))
      .withColumn("_z", zValue(
        bucketExpr("_zx", r.getLong(1), r.getLong(2)),
        bucketExpr("_zy", r.getLong(3), r.getLong(4))))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z", "_zx", "_zy")
      .write.mode("overwrite").parquet(path)
  }
}

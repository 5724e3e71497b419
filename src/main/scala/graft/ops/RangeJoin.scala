package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Keyed range (interval) join: pairs `(l, r)` with `l.key = r.key` and
  * `r.ts ∈ [l.ts + lo, l.ts + hi]`.
  *
  * Spark's built-in planner turns a `BETWEEN` join condition plus equi-key
  * into an equi-join on the key with the range as a post-filter — fine
  * when keys are selective, but a hot key degenerates to a per-key cross
  * product. This operator adds the standard banding decomposition
  * (cf. interval joins in stream processors): both sides are bucketed to
  * fixed time bands of width `hi - lo`, the left side duplicated into the
  * (at most 2) bands its window overlaps, and the join key becomes
  * `(key, band)` — so the shuffle co-locates only rows whose windows can
  * possibly overlap, and per-task work is bounded by band population, not
  * key population. A matching right row's single band equals exactly one
  * of the left row's two distinct candidate bands, so no pair duplicates
  * arise and no post-distinct is needed.
  *
  * `ts` columns are epoch longs (any unit; `lo`/`hi` in the same unit).
  * Null keys/timestamps never match (dropped by the band arithmetic),
  * matching SQL inner-join semantics.
  */
object RangeJoin {

  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
      lts: String, rts: String, lo: Long, hi: Long): DataFrame = {
    require(hi > lo, s"empty range [$lo, $hi]")
    val w = hi - lo
    // Integer floor-div banding (not `/` — double division loses ulps on
    // epoch-nano longs; not bare `div` — Spark's `div` truncates toward
    // zero, which would make the band containing t=0 span 2w−1 values and
    // break the uniform-width skew bound for negative epochs).
    def band(x: String): Column =
      expr(s"(($x) div ${w}L) + (CASE WHEN (($x) % ${w}L) < 0 THEN -1 ELSE 0 END)")
    val l = left
      .withColumn("_band", explode(array_distinct(array(
        band(s"`$lts` + ${lo}L"), band(s"`$lts` + ${hi}L")))))
    val r = right.withColumn("_band", band(s"`$rts`"))
    l.join(r,
        l("_band") === r("_band") && l(key) === r(key) &&
          r(rts) >= l(lts) + lo && r(rts) <= l(lts) + hi)
      .drop(r(key)) // keep one unambiguous key column (the left's)
      .drop("_band")
  }

  /** q40 — error events within 1 hour after each purchase of the same
    * user (error-attribution window — the interval-join shape the
    * reference's exact-timestamp left join J6 cannot express).
    */
  def q40RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
        col("value").as("e_value"))
    rangeJoin(purchases, errors.withColumnRenamed("e_user", "user_id"),
        "user_id", "ts", "e_ts", 0L, HourNs)
      .groupBy("event_id", "user_id")
      .agg(count(lit(1)).as("n_errors_1h"),
        round(sum(col("e_value")), 2).as("err_value_1h"))
  }

  private val HourNs = 3600L * 1000L * 1000L * 1000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_range_join" -> q40RangeJoin)

  val oracle: Map[String, String] = Map(
    // Plain inequality join — an independent formulation of the same
    // interval semantics (inclusive ends); epoch_ns for exact ns math.
    "q40_range_join" ->
      s"""SELECT p.event_id, p.user_id, count(*) AS n_errors_1h,
         |  round(sum(e.value), 2) AS err_value_1h
         |FROM (SELECT event_id, user_id, ts FROM events
         |      WHERE event_type = 'purchase') p
         |JOIN (SELECT user_id, ts, value FROM events
         |      WHERE event_type = 'error') e
         |  ON p.user_id = e.user_id
         | AND epoch_ns(e.ts) >= epoch_ns(p.ts)
         | AND epoch_ns(e.ts) <= epoch_ns(p.ts) + $HourNs
         |GROUP BY 1, 2""".stripMargin)
}

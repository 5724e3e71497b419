package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.load

/** As-of (nearest-prior) join.
  *
  * Spark has no ASOF JOIN operator; per the preference order the first
  * resort is COMPOSITION, and as-of composes exactly: tag both sides,
  * union them, and carry the last right-side value forward over a
  * (key, ts) window — one shuffle + one sort, the same cost a native
  * sort-merge as-of implementation pays, with no custom physical plan to
  * maintain. (A range/interval join with per-row tolerance is where a
  * custom `SparkPlan` would earn its keep; nearest-prior does not need it.)
  *
  * Tie semantics: a right row at exactly the left timestamp matches
  * (`rts <= lts`), so right sorts before left at equal ts.
  */
object AsOf {

  /** For each left row, attach `valueCol` from the latest right row with
    * `right.ts <= left.ts` on the same key (null if none). Output = left
    * columns + `asof_<valueCol>`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      valueCol: String): DataFrame = {
    val leftCols = left.columns
    val vType = right.schema(valueCol).dataType
    val l = left.withColumn("_side", lit(1))
      .withColumn("_v", lit(null).cast(vType))
    val r = right.select(col(key), col(ts), col(valueCol).as("_v"))
      // SQL equality never matches null keys; window partitioning would
      // group them — drop null-key right rows so both formulations agree
      // (null-key left rows then get a null as-of value, like ASOF LEFT).
      .filter(col(key).isNotNull)
      .withColumn("_side", lit(0))
    val unioned = l.select((Seq(col(key), col(ts), col("_side"), col("_v")) ++
      leftCols.filterNot(c => c == key || c == ts).map(col)): _*)
      .unionByName(r.select(col(key), col(ts), col("_side"), col("_v")),
        allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Row presence, not value non-nullness, decides the match: wrap right
    // rows in a non-null struct so a matched right row with a NULL value
    // yields NULL (DuckDB ASOF semantics) instead of an older non-null
    // value carried forward past it.
    unioned
      .withColumn("_vs",
        when(col("_side") === 0, struct(col("_v").as("v"))))
      .withColumn(s"asof_$valueCol",
        last(col("_vs"), ignoreNulls = true).over(w).getField("v"))
      .filter(col("_side") === 1)
      .select(leftCols.toIndexedSeq.map(col) :+ col(s"asof_$valueCol"): _*)
  }

  /** q29 — as-of join on the events stream: each error event picks up the
    * value of the same user's most recent purchase at-or-before it
    * (nearest-prior enrichment — the alignment the reference sidesteps by
    * exact-timestamp left join, SURVEY §2.3 note).
    */
  def q29AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    asofJoin(errors, purchases, "user_id", "ts", "value")
      .select(col("event_id"), col("user_id"),
        round(coalesce(col("asof_value"), lit(-1.0)), 2).as("last_purchase_value"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_asof_join" -> q29AsofJoin)

  val oracle: Map[String, String] = Map(
    // DuckDB's native ASOF JOIN is the oracle — an independent
    // implementation of the same semantics (inclusive nearest-prior).
    "q29_asof_join" ->
      """SELECT e.event_id, e.user_id,
        |  round(coalesce(p.value, -1.0), 2) AS last_purchase_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
        |ASOF LEFT JOIN
        |  (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts""".stripMargin)
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.load

/** Slowly-changing-dimension (Type 2) history build: collapse a per-key
  * change log into versioned validity intervals — the standard warehouse
  * shape for "what was this entity's state at time T", and the batch
  * complement to the streaming latest-per-key (q6) and as-of (q29)
  * operators (reference keeps only current state, extractor.py:206-246;
  * history is the north-star addition).
  *
  * Scale: everything is per-key windows over one hash partitioning —
  * ONE shuffle on the key and ONE sort for the whole pipeline (lag,
  * change filter, lead, version number all share it; plan-pinned). At
  * 100 TB this is the minimum any history build pays; no self-join, no
  * driver state. Skewed keys are bounded by per-user event counts, not
  * corpus size.
  *
  * Determinism: rows are totally ordered by (ts, event_id) — event_id is
  * unique — so lag/lead/row_number are reproducible across engines,
  * partitionings and runs. Time resolution is MICROSECONDS: DuckDB's
  * parquet reader coerces TIMESTAMP_NS to µs, so µs is the finest
  * cross-engine-stable unit — both engines order and emit the same
  * `ns div 1000` longs (sub-µs order differences can't leak in because
  * neither engine ever sees two different orderings: equal-µs ties are
  * broken by event_id in BOTH formulations).
  */
object Scd {

  /** Generic SCD2 build: one row per (key) state change in `df`, with
    * `valid_from`/`valid_to` (null = still current) and a 1-based
    * `version`. `tieCol` must make (ts, tie) unique per key; `ts` is an
    * epoch-nanos long, emitted as epoch-µs.
    */
  def scd2(df: DataFrame, key: String, stateCol: String, ts: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(key)
      .orderBy(col("_ts_us").asc, col(tieCol).asc)
    df.select(col(key), col(stateCol),
        expr(s"$ts div 1000").as("_ts_us"), col(tieCol))
      .withColumn("_prev", lag(col(stateCol), 1).over(w))
      // First row per key (null lag) opens the history; equal-to-previous
      // rows are no-ops. Null-safe on purpose: a null state after a
      // non-null one compares null <> x -> null -> dropped, matching the
      // oracle's SQL semantics exactly (both engines, same truth table).
      .filter(col("_prev").isNull || col("_prev") =!= col(stateCol))
      .select(
        col(key),
        col(stateCol).as("status"),
        col("_ts_us").as("valid_from"),
        lead(col("_ts_us"), 1).over(w).as("valid_to"),
        row_number().over(w).as("version"))
  }

  /** q54 — SCD2 history of each user's event_type stream: one row per
    * status change with its validity interval (open-ended for the
    * current state).
    */
  def q54Scd2(s: SparkSession, dir: String): DataFrame =
    scd2(load(s, dir, "events"), "user_id", "event_type", "ts", "event_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_scd2" -> q54Scd2)

  val oracle: Map[String, String] = Map(
    // Same window formulation, independently stated. epoch_us(ts) ==
    // Spark's `ts div 1000` exactly: DuckDB's parquet reader already
    // truncated TIMESTAMP_NS to µs, and epochs are positive so floor
    // and truncating division agree.
    "q54_scd2" ->
      """WITH ordered AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events
        |), changes AS (
        |  SELECT user_id, event_type, ts_us, event_id FROM ordered
        |  WHERE prev IS NULL OR prev <> event_type
        |)
        |SELECT user_id, event_type AS status, ts_us AS valid_from,
        |       lead(ts_us) OVER w AS valid_to,
        |       CAST(row_number() OVER w AS INT) AS version
        |FROM changes
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)""".stripMargin)
}

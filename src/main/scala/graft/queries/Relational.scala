package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.load

/** Core relational operator inventory (SURVEY.md §2.2-§2.7), expressed over
  * the driver's TPC-H-ish testdata. Each query has a matching DuckDB oracle
  * in [[Relational.oracle]]; column names are aliased identically on both
  * sides because the driver's compare sorts columns by name before hashing.
  *
  * Determinism rules (the oracle compare is an exact hash):
  *   - every floating-point aggregate is `round(x, 2)` on both sides;
  *   - raw event timestamps are never emitted (testdata `events.ts` is
  *     nanosecond parquet which Spark truncates to micros but DuckDB keeps —
  *     emit bigint epoch-second buckets instead);
  *   - top-k / latest-per-key always carry a total tie-break key.
  *
  * Scale posture (local tests, 100 TB design): dimension joins (region /
  * nation / supplier — bounded small at any SF) are explicit `broadcast`;
  * aggregations are plain groupBy so Catalyst plans partial+final hash agg
  * with map-side combine; filters sit directly on scans so they push into
  * the parquet reader.
  */
object Relational {

  /** q1 — A1 hash group-by, multiple measures (ref extractor.py:242-246). */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        count(lit(1)).as("cnt"))

  /** q2 — P1/P3 filter + projection + scalar math; predicates push to parquet. */
  def q2FilterProject(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem")
      .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        // 2dp × 2dp has exactly 4 decimals — round(…, 2) would sit on
        // .005 ties where engines' double-rounding disagrees; 4dp is exact.
        round(col("l_extendedprice") * col("l_discount"), 4).as("disc_revenue"))

  /** q3 — J7/J9 star join through two broadcast dims + group agg. */
  def q3JoinAgg(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "orders")
      .join(load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(load(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(load(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(round(sum(col("o_totalprice")), 2).as("total_price"),
        count(lit(1)).as("n_orders"))

  /** q4 — A2/W1 pivot (long → wide) with an explicit pivot-value domain:
    * at 100 TB you never let Spark run the extra distinct-values job —
    * `pivot(col, values)` keeps it a single pass. pandas pivot_table
    * averages duplicate cells (SURVEY §7.4.1) → avg here.
    */
  def q4Pivot(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(avg(col("o_totalprice")), 2))
      .withColumnsRenamed(Map("F" -> "avg_f", "O" -> "avg_o", "P" -> "avg_p"))

  /** q5 — W2 unpivot (wide → long, publisher.py:58-80 melt). */
  def q5Unpivot(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 2).as("extendedprice"),
        round(col("l_quantity"), 2).as("quantity"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("extendedprice"), col("quantity")),
        "measure", "value")

  /** q6 — A5 latest-per-key as row_number()=1 (dashboard.py:363-365);
    * total order: ts desc then event_id desc (ties broken deterministically).
    */
  def q6LatestPerKey(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    load(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        round(col("value"), 2).as("value"))
  }

  /** q7 — A9/W3 5-minute tumbling bucket sums (dashboard.py:546-555).
    * Bucket emitted as bigint epoch seconds for cross-engine determinism.
    */
  def q7TimeBucket(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "events")
      .withColumn("bucket_s", (expr("ts div 300000000000") * 300).cast("long"))
      .groupBy("bucket_s", "event_type")
      .agg(round(sum(col("value")), 2).as("sum_value"), count(lit(1)).as("n_events"))

  /** q13 — J2 anti join: customers with no high-value (>300k) order. */
  def q13AntiJoin(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "customer")
      .join(
        load(s, dir, "orders").filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> q1Agg,
    "q2_filter_project" -> q2FilterProject,
    "q3_join_agg" -> q3JoinAgg,
    "q4_pivot" -> q4Pivot,
    "q5_unpivot" -> q5Unpivot,
    "q6_latest_per_key" -> q6LatestPerKey,
    "q7_time_bucket" -> q7TimeBucket,
    "q13_anti_join" -> q13AntiJoin)

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice * l_discount, 4) AS disc_revenue
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q3_join_agg" ->
      """SELECT r_name, n_name,
        |  round(sum(o_totalprice), 2) AS total_price, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q4_pivot" ->
      """SELECT o_orderpriority,
        |  round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS avg_f,
        |  round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS avg_o,
        |  round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 2) AS avg_p
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q5_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'extendedprice' AS measure,
        |  round(l_extendedprice, 2) AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
        |  round(l_quantity, 2) AS value FROM lineitem""".stripMargin,
    "q6_latest_per_key" ->
      """SELECT user_id, event_id, event_type, round(value, 2) AS value
        |FROM (SELECT *, row_number() OVER
        |        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1""".stripMargin,
    "q7_time_bucket" ->
      """SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS bucket_s,
        |  event_type,
        |  round(sum(value), 2) AS sum_value, count(*) AS n_events
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q13_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin)
}

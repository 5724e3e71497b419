package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for fact-fact joins and aggregations.
  *
  * AQE's skew-join splitting (on by default here) handles most runtime
  * skew; explicit salting remains the tool when one key dominates so hard
  * that even split partitions hot-spot (the classic null-key / power-law
  * entity case at 100 TB). Pattern: replicate the small side `salt` ways,
  * scatter the large side uniformly, join on (key, salt).
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, salted `salt` ways: the large
    * side gets a uniform salt per row (deterministic — hash of the whole
    * row — so retries/replays place rows identically), the small side is
    * replicated once per salt value. Result equals the unsalted join.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    val salted = large.withColumn("_salt",
      pmod(hash(struct(large.columns.toIndexedSeq.map(col): _*)), lit(salt)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until salt).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (key, salt), then final-aggregate on key. `aggs` maps a measure
    * column to (partial, final) aggregator pairs — e.g. sum/sum,
    * count/sum. Equivalent to the direct groupBy for decomposable
    * aggregates; the hot key's partial work spreads over `salt` reducers.
    */
  def saltedSum(df: DataFrame, key: String, salt: Int,
      measures: Seq[String]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(struct(df.columns.toIndexedSeq.map(col): _*)), lit(salt)))
    val partial = salted.groupBy(col(key), col("_salt"))
      .agg(measures.head -> "sum", measures.tail.map(_ -> "sum"): _*)
    val renamed = measures.foldLeft(partial) { (d, m) =>
      d.withColumnRenamed(s"sum($m)", m)
    }
    renamed.groupBy(col(key))
      .agg(measures.head -> "sum", measures.tail.map(_ -> "sum"): _*)
      .select(col(key) +: measures.map(m => col(s"sum($m)").as(s"sum_$m")): _*)
  }
}

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
    * replicated once per salt value. Result equals the unsalted join for
    * inner and left joins ONLY — outer-preserving the replicated side
    * would emit one null-padded row per salt copy, so right/full outer
    * are rejected rather than silently wrong.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(
      Set("inner", "left", "leftouter", "leftsemi", "leftanti")
        .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins; '$joinType' would duplicate " +
        "unmatched replicated-side rows")
    val salted = large.withColumn("_salt",
      pmod(hash(struct(large.columns.toIndexedSeq.map(col): _*)), lit(salt)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until salt).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Two-phase SUM aggregation for skewed group keys: partial-sum on
    * (key, salt), then final-sum on key — equivalent to the direct
    * groupBy sum, with the hot key's partial work spread over `salt`
    * reducers. Output columns are `sum_<measure>`. (Other decomposable
    * aggregates follow the same two-phase shape; only sum is provided.)
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

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Deterministic content-hash sampling and split assignment for corpus
  * curation (the reference's dataset has no sampling; these are the
  * north-star training-pipeline operators).
  *
  * Both operators key on `md5(doc_id ':' text)` — a pure function of the
  * row, so the sample/split is (a) reproducible across runs, engines and
  * cluster sizes, (b) stable under repartitioning and insertion order
  * (unlike `rand()` or `TABLESAMPLE`), and (c) a narrow per-row predicate:
  * it composes with a 100 TB scan at parquet-read speed with no shuffle
  * and no driver-side state. Rate granularity here is 1/16 per hex digit;
  * widen the prefix for finer rates.
  */
object Sampling {

  // concat (null-propagating, like the oracle's `||`) — NOT concat_ws,
  // which silently skips null arguments and would hash a null-text row
  // from doc_id alone while the oracle drops it: a cross-engine
  // divergence in an operator whose whole contract is determinism.
  // A null key hashes to null → excluded from the sample (q38) and
  // CASE-falls-through to the last split (q39) in both engines.
  private def hexKey(c: Column*): Column =
    substring(md5(concat(c.flatMap(x => Seq(x, lit(":"))).dropRight(1): _*)), 1, 1)

  private val SampleDigits = Seq("0", "1", "2") // 3/16 ≈ 18.75%

  /** q38 — deterministic hash sample of `documents` (~19%): rows whose
    * content-hash first hex digit falls in a fixed set.
    */
  def q38HashSample(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .filter(hexKey(col("doc_id").cast("string"), col("text"))
        .isin(SampleDigits.map(x => x: Any): _*))
      .select(col("doc_id"), col("source"), col("lang"))

  /** q39 — train/val/test split assignment by hash bucket (12/2/2 of 16),
    * reported as per-(source, split) counts — the stratification audit a
    * pipeline runs before training.
    */
  def q39SplitAssign(s: SparkSession, dir: String): DataFrame = {
    val h = hexKey(col("doc_id").cast("string"), col("text"))
    load(s, dir, "documents")
      .select(col("source"),
        when(h < "c", "train").when(h < "e", "val").otherwise("test").as("split"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_hash_sample" -> q38HashSample,
    "q39_split_assign" -> q39SplitAssign)

  private val hSql = "substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 1)"

  val oracle: Map[String, String] = Map(
    "q38_hash_sample" ->
      s"""SELECT doc_id, source, lang FROM documents
         |WHERE $hSql IN (${SampleDigits.map(d => s"'$d'").mkString(", ")})""".stripMargin,
    "q39_split_assign" ->
      s"""SELECT source,
         |  CASE WHEN $hSql < 'c' THEN 'train'
         |       WHEN $hSql < 'e' THEN 'val'
         |       ELSE 'test' END AS split,
         |  count(*) AS n_docs
         |FROM documents GROUP BY 1, 2""".stripMargin)
}

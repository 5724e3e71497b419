package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table persistence: pre-shuffling fact tables once at write
  * time so every subsequent equi-join/aggregation on the bucket key is
  * co-located — no exchange at read time. This is the storage-side answer
  * to "minimize shuffles" at 100 TB: the big fact-fact joins (lineitem ⋈
  * orders on orderkey, events self-joins on user_id) pay their shuffle
  * once, at load.
  */
object Bucketed {

  /** Write `df` as a bucketed, per-bucket-sorted table at `path`. */
  def write(df: DataFrame, table: String, path: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def drop(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")
}

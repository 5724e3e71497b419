package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loading for the driver testdata layout (TESTDATA.md):
  * `<dir>/<name>.parquet`, one file per table. All queries resolve their
  * inputs through here so scans stay uniform (predicate pushdown + column
  * pruning verified once, in [[graft.PlanChecks]]).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark 4 refuses to read
      // as a timestamp; read it as epoch-nanos long (exact — also makes
      // ordering comparisons identical to engines that keep nanos).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }
}

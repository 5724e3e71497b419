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

  /** Spread a scan across the cluster when the file layout
    * under-parallelizes it: parquet splits can't be finer than row
    * groups, so a single-row-group file (these fixtures; any
    * small-file corpus) scans as ONE task and every narrow transform
    * above it — md5 shingling, tokenizing — runs single-threaded no
    * matter how many cores exist. The round-robin repartition costs one
    * tiny shuffle of the raw rows and buys back full parallelism for
    * the compute-heavy stage above. No-op when the scan already has
    * enough splits — at real scale (thousands of row groups) adding a
    * reshuffle of the whole input would be pure loss, so callers get
    * the guard for free. Only safe below order-insensitive aggregation
    * (min/max/count): round-robin changes partial-agg grouping, which
    * a float partial sum would expose (never use it there).
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // df.rdd.getNumPartitions materializes the RDD lineage eagerly to
    // read the scan's split count — a plan-time side effect (cheap: no
    // job runs, but the physical plan is built twice). Acceptable while
    // spread() sits on a handful of hash-heavy operators; if it ever
    // wraps every query, probe the split count from the FileIndex
    // instead of the RDD.
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target) else df
  }

  /** Write `df` as a bucketed (and per-bucket sorted) catalog table —
    * the storage-layout half of shuffle elimination: two tables bucketed
    * on the same key with the same bucket count join WITHOUT any
    * exchange (each bucket pair streams through a sort-merge join), and
    * a `groupBy` on the bucket key skips its shuffle too. This is the
    * fact-⋈-fact answer at 100 TB, where neither side broadcasts and a
    * repeated join key makes the per-query shuffle the dominant cost:
    * pay one bucketed write, then every subsequent join/agg on that key
    * is exchange-free (BucketingSpec pins the plan). Spark buckets by
    * `hash(key) mod n` at write time; the sortBy makes the merge side
    * sort-free on read.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      buckets: Int, key: String): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Hive-style partitioned layout (`path/col=value/…`) — the read-side
    * counterpart to bucketing: a filter on the partition column prunes
    * whole directories at PLANNING time (`PartitionFilters` on the scan,
    * zero I/O for excluded partitions), which is how a 100 TB table
    * answers a one-day query by reading one day. Partition by low-
    * cardinality, always-filtered columns (date, region); high-
    * cardinality keys belong in buckets — a million tiny directories is
    * its own scaling failure (PartitioningSpec pins both the pruned plan
    * and the file-level behavior).
    */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write
      .partitionBy(cols: _*)
      .mode("overwrite")
      .parquet(path)
}

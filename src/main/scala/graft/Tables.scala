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

  // Bucketed (write-time pre-shuffled) tables live in
  // [[graft.sources.Bucketed]] — BucketedSpec pins the exchange-free
  // fact-fact join and the bucket-count-mismatch fallback.

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

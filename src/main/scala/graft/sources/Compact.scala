package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction: rewrite a parquet directory into files of
  * ~`targetBytes` each. The 100 TB failure mode this serves: streaming
  * and incremental jobs (Sinks' foreachBatch log, JdbcLookup's upsert
  * side-channel, any per-batch append) accrete thousands of KB-sized
  * files, and every downstream scan then pays one task + one open per
  * file while the driver's file index grows without bound. Periodic
  * compaction is the standard maintenance op (Delta/Iceberg `OPTIMIZE`);
  * this is the plain-parquet equivalent.
  *
  * Sizing comes from the ACTUAL byte size of the input (recursive, so
  * Hive-partitioned layouts count correctly), not a guessed row count —
  * the one quantity that predicts output file size for free.
  *
  * Shuffle policy: `coalesce` by default — compaction already rewrites
  * every byte once; adding a full shuffle would double the I/O for
  * nothing when the goal is merely fewer files. Coalesce packs whole
  * input splits into output tasks, so output sizes are even to within
  * one input file's size — exactly what merging many SMALL files
  * guarantees. Pass `shuffle = true` only when inputs are few and wildly
  * uneven (then the rebalance is worth a second pass over the data).
  */
object Compact {

  /** Rewrite `inPath` (parquet) to `outPath` as ~targetBytes files.
    * Returns the file count actually written — which can be LESS than
    * the byte-derived plan when coalesce hits the input split count
    * (coalesce never up-splits), so callers sizing a follow-up pass must
    * not trust the plan.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long, shuffle: Boolean = false): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val conf = spark.sessionState.newHadoopConf()
    val src = new Path(inPath)
    val fs = src.getFileSystem(conf)
    val totalBytes = fs.getContentSummary(src).getLength
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inPath)
    val packed = if (shuffle) df.repartition(n) else df.coalesce(n)
    packed.write.mode("overwrite").parquet(outPath)
    val out = new Path(outPath)
    out.getFileSystem(conf).listStatus(out)
      .count(f => f.getPath.getName.endsWith(".parquet"))
  }
}

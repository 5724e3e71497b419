package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timer for queries OUTSIDE the Bench headline set
  * (Bench's set stays frozen for cross-round comparability):
  * `sbt "runMain graft.Timed <sfDir> <query...>"` — warm-up + min-of-3
  * per query, cache cleared between runs.
  */
object Timed {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Timed <sfDir> [queryName...]")
    val dir = args.head
    val names = if (args.length > 1) args.tail.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      SparkEntry.queries(n)(spark, dir).count() // warm
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMING $n min=${times.min}%.3f " +
        s"runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries on
  * `SPARK_GRAFT_SF_DIR` at local[32] and prints ONE JSON line
  * `{"metric":…,"value":…,"unit":"sec","queries":{…},"sf":…}`.
  *
  * Headline set = the shuffle/join/agg-heavy queries that dominate at
  * scale, not the whole inventory (Verify covers completeness; Bench
  * tracks throughput).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Optional second arg: shuffle partition count (default = cores; the
    // sbt server swallows client env vars, so experiments pass it here).
    val shufflePartitions = args.lift(1).getOrElse(cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val headline: Seq[String] = {
      val all = SparkEntry.queries.keySet
      val preferred = Seq(
        "q1_agg", "q3_join_agg", "q5_unpivot", "q6_latest_per_key",
        "q7_time_bucket", "q29_asof_join", "d1_exact_dedup", "d2_minhash_lsh",
        "d4_ngram_jaccard", "s1_knn_cosine", "s3_ivf_ann",
        "t1_quality_score", "t5_ngram_freq", "m2_frame_sample")
        .filter(all.contains)
      if (preferred.nonEmpty) preferred else all.toSeq.sorted
    }

    // Warm-up pass at tiny scale so JIT/codegen/classloading doesn't
    // pollute the measured numbers.
    headline.foreach { name =>
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }

    // Three measured runs, report the min — run-to-run noise at this
    // scale is ±10-15% (measured, round 3), larger than most real
    // per-query deltas, and the min is the reproducible figure. Spark's
    // cache is cleared before every timed run so cached intermediates
    // are measured cold. A failing query reports -1, never its
    // elapsed-to-failure time (a regression must not read as a speedup).
    val results = headline.map { name =>
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val ok =
          try { SparkEntry.queries(name)(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      (name, times,
        if (times.exists(_ >= 0)) times.filter(_ >= 0).min else -1.0)
    }
    val qs = results.map { case (k, _, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    // All samples, not just the min: a contaminated environment (noisy
    // neighbor, cold page cache, concurrent compile) shows up as one
    // outlier sample among stable ones — self-evident in the artifact
    // instead of needing an out-of-band re-run to adjudicate.
    val ts = results.map { case (k, times, _) =>
      "\"" + k + "\":" + times.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.map(_._3).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"times":$ts,"sf":"$sfDir"}""")
    spark.stop()
  }
}

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
  /** Machine-quietness evidence (VERDICT r13 item 5): three of four
    * round-boundary benches drew from a loaded machine (r11, r12's v1
    * movers, r13's 3-4x first-seven inflation) and each cost a manual
    * re-run to adjudicate. Recording /proc/loadavg and the count of
    * OTHER busy JVMs/replays before and after the run puts the
    * contamination verdict inside BENCH_r*.json itself. Fields are
    * -1 when /proc is unavailable (non-Linux dev box) — evidence,
    * never a gate.
    */
  private def loadavg: (Double, Double, Double) =
    try {
      val f = scala.io.Source.fromFile("/proc/loadavg")
      try { val p = f.mkString.trim.split("\\s+"); (p(0).toDouble, p(1).toDouble, p(2).toDouble) }
      finally f.close()
    } catch { case scala.util.control.NonFatal(_) => (-1.0, -1.0, -1.0) }

  /** Non-ancestor java/duckdb/python processes (the sbt server chain
    * is ours; a concurrent gate replay or second sbt is not) — count
    * plus their cmdline prefixes. The cmdlines matter because the
    * orchestrator's own python is a PERMANENT non-ancestor sibling
    * (ADVICE r14: `other_workers=1` is the practical floor), so the
    * bare count can't distinguish benign-1 from contaminated-1; the
    * recorded cmdlines make that readable from the artifact.
    */
  private def otherWorkers: (Long, Seq[String]) = try {
    import scala.jdk.CollectionConverters._
    val ancestors = Iterator.iterate(Option(ProcessHandle.current())) {
      _.flatMap(p => if (p.parent().isPresent) Some(p.parent().get) else None)
    }.takeWhile(_.isDefined).flatten.map(_.pid).toSet
    val offenders = ProcessHandle.allProcesses().iterator().asScala.flatMap { p =>
      val cmd = p.info().command().orElse("")
      if ((cmd.contains("java") || cmd.contains("duckdb") || cmd.contains("python")) &&
          !ancestors.contains(p.pid)) {
        val line = p.info().commandLine().orElse(cmd)
        Some(line.take(80))
      } else None
    }.toVector
    (offenders.size.toLong, offenders.take(5))
  } catch { case scala.util.control.NonFatal(_) => (-1L, Nil) }

  /** Liveness markers so tools/sf_gate.sh refuses to start a gate while
    * a bench is measuring (the other half of item 5 — the gate is the
    * contaminator we can control in-repo). Both sides carry
    * `pid:starttime` tokens (see [[Markers]]) since round 15: raw pid
    * liveness had a recycling false positive, observed live in round
    * 14 (a quiet bench recorded gate_overlap:true against a dead
    * gate's recycled pid).
    */
  private val marker = java.nio.file.Paths.get("/tmp/graft_bench.running")

  /** A gate/replay marker counts as an overlap only while its WRITER is
    * alive — a gate SIGKILLed mid-run leaves its file behind (the EXIT
    * trap never fires), and without the writer-identity check every
    * later bench on a quiet machine would be falsely discredited as
    * gate-contaminated, recreating the manual re-run cost this record
    * exists to eliminate.
    */
  private def gateLive: Boolean =
    Markers.readLive(java.nio.file.Paths.get("/tmp/graft_gate.running"))._1

  def main(args: Array[String]): Unit = {
    // Quiet-wait (VERDICT r14 item 3): four of five round-boundary
    // benches measured a loaded machine. When load1 is above threshold
    // or a gate/replay is live, sleep-and-resample before measuring —
    // a bounded wait (default 20x30 s) beats a contaminated artifact
    // plus a manual adjudication re-run. The wait itself is recorded.
    // Threshold 1.0, not 2.0: the round-15 refresh measured that
    // load1_before in the 1.5-2.0 band still inflates the v2 total
    // ~5-10% (lingering decay from a prior heavy phase) — the judge's
    // quiet band (v1 4.0-4.5 / v2 16-17 s) is only reproducible from
    // load1 < ~1.
    val waitThreshold =
      sys.env.getOrElse("GRAFT_BENCH_QUIET_LOAD", "1.0").toDouble
    // load5 gate too (VERDICT r15 item 2): the r15 judge's own bench ran
    // at load1 0.72 but load5/load15 still 1.51/2.26 — decay from the
    // just-finished 9.5-min test suite — and read v2 ~18% above the
    // committed quiet band. load1 alone lets a post-heavy-phase bench
    // self-certify as quiet while the page cache / CPU thermals are
    // still settling; load5 < 1.5 is the observed boundary of the band.
    val waitThreshold5 =
      sys.env.getOrElse("GRAFT_BENCH_QUIET_LOAD5", "1.5").toDouble
    val maxWaits = sys.env.getOrElse("GRAFT_BENCH_QUIET_TRIES", "20").toInt
    def busy: Boolean = {
      val (l1, l5, _) = loadavg
      l1 > waitThreshold || l5 > waitThreshold5 || gateLive
    }
    var waits = 0
    while (waits < maxWaits && busy) {
      System.err.println(
        f"[bench] machine busy (load1=${loadavg._1}%.2f, load5=${loadavg._2}%.2f, gate=$gateLive) — " +
          s"waiting 30 s (${waits + 1}/$maxWaits)")
      Thread.sleep(30000)
      waits += 1
    }
    val quietWaitS = waits * 30
    val quietGaveUp = waits >= maxWaits && busy
    // Quietness snapshot next — before this JVM's own session build /
    // warm-up contributes to the load figures.
    val (l1b, l5b, l15b) = loadavg
    val (workersBefore, workerCmdsBefore) = otherWorkers
    val gateBefore = gateLive
    val ownMarker = Markers.claim(marker)
    // EVERYTHING after the claim runs under one finally (ADVICE r14:
    // Bench runs inside the long-lived sbt server, so an early throw —
    // bad sfDir, session-build failure — must not leave a marker
    // holding the server's live pid, or every later gate refuses).
    try runBench(args, l1b, l5b, l15b, workersBefore,
      workerCmdsBefore, gateBefore, quietWaitS, quietGaveUp)
    finally { if (ownMarker) Markers.release(marker) }
  }

  private def runBench(args: Array[String],
      l1b: Double, l5b: Double, l15b: Double, workersBefore: Long,
      workerCmdsBefore: Seq[String], gateBefore: Boolean,
      quietWaitS: Int, quietGaveUp: Boolean): Unit = {
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

    val all = SparkEntry.queries.keySet
    // v1 — FROZEN since round 2 for cross-round comparability; never
    // append here (a changed set makes total-vs-last-round meaningless).
    val headline: Seq[String] = {
      val preferred = Seq(
        "q1_agg", "q3_join_agg", "q5_unpivot", "q6_latest_per_key",
        "q7_time_bucket", "q29_asof_join", "d1_exact_dedup", "d2_minhash_lsh",
        "d4_ngram_jaccard", "s1_knn_cosine", "s3_ivf_ann",
        "t1_quality_score", "t5_ngram_freq", "m2_frame_sample")
        .filter(all.contains)
      if (preferred.nonEmpty) preferred else all.toSeq.sorted
    }
    // v2 — the round-4/5 operator surface, versioned separately so
    // regressions in the newer ops show up in BENCH artifacts (not only
    // ad-hoc Timed runs) while v1 totals stay comparable across rounds.
    val headlineV2: Seq[String] = Seq(
      "s7_kmeans_assign", "s8_pq_trained", "s3b_ivf_trained",
      "t10_contamination", "d11_semantic_dedup", "q54_scd2",
      "q55_weighted_pick", "q56_retention", "q57_hop_window",
      "t11_pack", "q58_mixture_sample", "q59_token_budget",
      "q60_temperature_mix", "t12_bm25", "d12_substr_spans",
      "d14_winnow", "d15_prefix_jaccard")
      // d13/t14/c4/t15/t16 are deliberately absent: their outputs are
      // left joins with unique right keys, which Spark 4 eliminates
      // wholesale under Bench's count() — the "measurement" would be
      // a bare documents scan (verified on the optimized plan). t13 is
      // d12 plus an eval tag on the identical pipeline. d12 carries
      // the family's real kernel (the window-hash flag pipeline).
      .filter(all.contains)

    // Warm-up pass at tiny scale so JIT/codegen/classloading doesn't
    // pollute the measured numbers.
    (headline ++ headlineV2).foreach { name =>
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }

    // Three measured runs, report the min — run-to-run noise at this
    // scale is ±10-15% (measured, round 3), larger than most real
    // per-query deltas, and the min is the reproducible figure. Spark's
    // cache is cleared before every timed run so cached intermediates
    // are measured cold. A failing query reports -1, never its
    // elapsed-to-failure time (a regression must not read as a speedup).
    def measure(names: Seq[String]): Seq[(String, Seq[Double], Double)] =
      names.map { name =>
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
        (name, times.toSeq,
          if (times.exists(_ >= 0)) times.filter(_ >= 0).min else -1.0)
      }
    def minsJson(rs: Seq[(String, Seq[Double], Double)]): String =
      rs.map { case (k, _, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    // All samples, not just the min: a contaminated environment (noisy
    // neighbor, cold page cache, concurrent compile) shows up as one
    // outlier sample among stable ones — self-evident in the artifact
    // instead of needing an out-of-band re-run to adjudicate.
    def timesJson(rs: Seq[(String, Seq[Double], Double)]): String =
      rs.map { case (k, times, _) =>
        "\"" + k + "\":" + times.map(t => f"$t%.3f").mkString("[", ",", "]")
      }.mkString("{", ",", "}")

    // Marker release happens in main's finally (which also covers an
    // early crash before this point — the round-14 leak path).
    val (results, resultsV2) = (measure(headline), measure(headlineV2))
    val (l1a, _, _) = loadavg
    val (workersAfter, workerCmdsAfter) = otherWorkers
    // Re-sample AFTER the run: a gate that starts mid-measurement (the
    // GRAFT_GATE_FORCE path, or the check-then-write race) is exactly
    // the contamination this field exists to capture.
    val gateOverlap = gateBefore || gateLive
    val total = results.map(_._3).filter(_ >= 0).sum
    val totalV2 = resultsV2.map(_._3).filter(_ >= 0).sum
    // "value"/"queries"/"times" stay v1-only (the frozen cross-round
    // series); the v2 set rides under distinct keys. "env" carries the
    // quietness record: load1 BEFORE should be ~0 on a clean run (this
    // JVM's own warm-up inflates load5/load15), other_workers counts
    // non-ancestor java/duckdb/python processes, gate_overlap flags a
    // concurrent tools/sf_gate.sh run.
    // Jsons.str, not a local escaper (ADVICE r15): a control char in a
    // captured commandLine (e.g. a newline inside a `python -c` argument
    // — the orchestrator's python is exactly what this field captures)
    // must not emit a literal control char inside a JSON string and make
    // the whole BENCH_r*.json line unparseable. Verify.q exists because
    // of this failure class (round-5 lesson).
    def cmdsJson(cmds: Seq[String]): String =
      cmds.map(Jsons.str).mkString("[", ",", "]")
    // Benign-sibling classifier (VERDICT r15 item 6): the sbt server's
    // own java process is a permanent non-ancestor sibling when Bench
    // runs as a forked `sbt -batch` JVM, so the bare other_workers count
    // has a practical floor of 1 and can't distinguish benign-1 from
    // contaminated-1. A cmdline matching the benign pattern (sbt server
    // / launcher; override via GRAFT_BENCH_BENIGN_RE) counts as benign;
    // everything else is real. A clean run now reads real=0 in the
    // artifact itself instead of needing the cmdline list adjudicated
    // by hand each round.
    val benignRe = sys.env.getOrElse("GRAFT_BENCH_BENIGN_RE",
      "sbt\\.script|sbt-launch|xsbt\\.boot").r
    def realWorkers(cmds: Seq[String]): Int =
      cmds.count(c => benignRe.findFirstIn(c).isEmpty)
    // jvm_uptime_s distinguishes a warm sbt-server run from a fresh
    // forked JVM in the artifact itself: the v2 set (driver-loop-heavy
    // Lloyd's training) is JIT-sensitive, and the round-15 adjudication
    // needed that fact out-of-band. ~60-200 s = fresh fork; hours = warm.
    val jvmUptimeS =
      java.lang.management.ManagementFactory.getRuntimeMXBean.getUptime / 1000
    val env = f"""{"load1_before":$l1b%.2f,"load5_before":$l5b%.2f,"load15_before":$l15b%.2f,"load1_after":$l1a%.2f,"other_workers_before":$workersBefore,"other_workers_after":$workersAfter,"other_workers_real_before":${realWorkers(workerCmdsBefore)},"other_workers_real_after":${realWorkers(workerCmdsAfter)},"other_worker_cmds_before":${cmdsJson(workerCmdsBefore)},"other_worker_cmds_after":${cmdsJson(workerCmdsAfter)},"gate_overlap":$gateOverlap,"quiet_wait_s":$quietWaitS,"quiet_gave_up":$quietGaveUp,"jvm_uptime_s":$jvmUptimeS}"""
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${minsJson(results)},"times":${timesJson(results)},"value_v2":$totalV2%.3f,"queries_v2":${minsJson(resultsV2)},"times_v2":${timesJson(resultsV2)},"sf":"$sfDir","env":$env}""")
    // Short summary trailer (VERDICT r15 item 1): the big line above
    // puts the per-query times arrays first and buries the headline
    // values mid-line, so the driver's BOUNDED tail-capture truncated
    // the v1 `value` clean out of BENCH_r15.json (parsed:null). This
    // second line is short enough that ANY tail window preserves a
    // parseable headline (v1+v2+env). Consumers that take the last
    // JSON line of stdout get the summary; the full per-query record
    // stays on the line above.
    println(f"""{"metric":"total_summary","value":$total%.3f,"value_v2":$totalV2%.3f,"unit":"sec","sf":"$sfDir","env":$env}""")
    spark.stop()
  }
}

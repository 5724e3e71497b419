package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Adversarial-skew evidence runner (VERDICT r6 item 6): on an events
  * table where ONE user holds ~30% of all rows (tools/skew_gen.py),
  * run the canonical fact⋈dim join and keyed aggregation three ways —
  *
  *   A. AQE skew-join split (the default path),
  *   B. skew split disabled (the straggler baseline a naive plan ships),
  *   C. split disabled + explicit salting (`ops/Skew`, the tool for
  *      keys so hot that even split partitions hot-spot),
  *
  * — asserting A ≡ C result-identical (count + order-independent
  * checksum; the salt may only reshape the shuffle) and printing
  * timings plus the plan markers (`isSkew=true` partition specs in A,
  * the salted `(user_id, _salt)` exchange in C) for SCALE.md.
  *
  * The dim is deliberately non-broadcastable (autoBroadcastJoinThreshold
  * = -1): broadcasting would dodge the skew entirely, which IS the
  * first-choice fix but not the case under test — at 100 TB the dim
  * that matters often doesn't fit. Skew thresholds are lowered to match
  * the probe corpus (sf1 ≈ 57 MB of events); the RELATIVE shapes are
  * what transfer to real scale, where default thresholds fire the same
  * way on multi-GB hot partitions.
  *
  * Usage: `sbt "runMain graft.SkewProbe .scale/sf1skew"`.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(".scale/sf1skew")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-skew-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512KB")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val events = load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("value"), col("props"))
    // Dim: one row per user (hot key included) with a derived attribute —
    // the fact-derived cohort-dim shape q56 uses, materialized so both
    // variants join the IDENTICAL input.
    val dim = events.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
      .withColumn("segment", pmod(col("user_id"), lit(100)))
      .localCheckpoint()

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    /** Order-independent result digest (count + sum of per-row hashes)
      * plus the digest query's EXECUTED adaptive plan — the join under
      * test is a subtree of it, with AQE's runtime decisions final.
      */
    def digest(df: DataFrame): ((Long, Long), String) = {
      val agg = df.agg(count(lit(1)), sum(hash(df.columns.map(col): _*).cast("long")))
      val r = agg.collect()(0)
      ((r.getLong(0), r.getLong(1)), agg.queryExecution.executedPlan.toString)
    }
    def joined = events.join(dim, Seq("user_id"))
      .select(col("user_id"), col("event_type"), col("value"), col("segment"))

    // A: AQE skew split (default on). One untimed warm-up first so A
    // doesn't absorb scan/JIT warm-up that B/C then skip.
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    digest(joined)
    val ((digA, planA), tA) = time(digest(joined))
    // B: split disabled — the hot partition runs as one straggler task.
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val ((digB, _), tB) = time(digest(joined))
    // C: explicit salting with the split still disabled.
    val dfC = ops.Skew.saltedJoin(events, dim, "user_id", salt = 16)
      .select(col("user_id"), col("event_type"), col("value"), col("segment"))
    val ((digC, planC), tC) = time(digest(dfC))
    // Keyed aggregation: salted two-phase sum vs direct groupBy sum.
    // Equality here is NUMERIC, not bitwise — the salt re-associates a
    // float sum (300k addends for the hot key), so compare per-key
    // within 1e-9 relative instead of hashing raw doubles.
    val direct = events.groupBy("user_id").agg(sum("value").as("sum_value"))
    val (nD, tD) = time(direct.count())
    val salted = ops.Skew.saltedSum(events, "user_id", 16, Seq("value"))
    val (nE, tE) = time(salted.count())
    val aggDiff = direct.join(salted.withColumnRenamed("sum_value", "sv2"), "user_id")
      .agg(count(lit(1)).as("n"),
        max(abs(col("sum_value") - col("sv2")) /
          greatest(abs(col("sum_value")), lit(1.0))).as("rel"))
      .collect()(0)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    println(f"PROBE join A (AQE skew split):    $tA%6.2f s digest=$digA")
    println(f"PROBE join B (split disabled):    $tB%6.2f s digest=$digB")
    println(f"PROBE join C (salted, no split):  $tC%6.2f s digest=$digC")
    println(f"PROBE agg  D (direct groupBy):    $tD%6.2f s keys=$nD")
    println(f"PROBE agg  E (saltedSum):         $tE%6.2f s keys=$nE")
    require(digA == digB && digB == digC, s"join digests diverge: $digA $digB $digC")
    require(nD == nE && aggDiff.getLong(0) == nD,
      s"agg key sets diverge: $nD vs $nE (joined ${aggDiff.getLong(0)})")
    val rel = aggDiff.getDouble(1)
    println(f"PROBE agg max relative diff: $rel%.2e (salt re-associates the float sum)")
    require(rel < 1e-9, s"salted sum numerically diverges: $rel")
    if (sys.env.contains("SKEW_PROBE_DUMP"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/tmp/skew_planA.txt"), planA)
    val skewMarks = "skew=true".r.findAllIn(planA).length +
      "AQEShuffleRead coalesced and skewed".r.findAllIn(planA).length
    println(s"PROBE plan A skew markers: $skewMarks " +
      "(SortMergeJoin(skew=true) + skewed AQEShuffleRead)")
    println(s"PROBE plan C salted exchange: " +
      planC.linesIterator.filter(_.contains("hashpartitioning(user_id"))
        .map(_.trim.take(120)).mkString(" | "))
    require(skewMarks > 0, "AQE skew split did not fire in variant A")
    println("PROBE OK: A==B==C and D==E, skew split fired, salted plan recorded")
    spark.stop()
  }
}

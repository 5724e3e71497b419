package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Extreme-duplication evidence runner for the prefix-Jaccard twin
  * collapse (the round-10 follow-up to the 300×-depth property test):
  * a tiny distinct corpus — five base texts, two near-dup base pairs —
  * duplicated to `depth` copies each, so the OUTPUT ITSELF is
  * quadratic in depth:
  *
  *   within-group pairs  5 · depth·(depth−1)/2     (J = 1.0)
  *   cross-group pairs   2 · depth²                (inherited scores)
  *
  * At depth 10,000 that is ~450M result rows from 50k input docs —
  * the regime the chunked expansion exists for: no row ever holds an
  * m_a×m_b product, the mid-expansion repartition spreads each giant
  * twin-pair across tasks keyed by the exploded member, and depth
  * 10,000 > BcastMaxGroup forces the checkpointed SHUFFLE path (the
  * 100 TB shape). The probe counts the result (no collect — the count
  * IS the assertion) against the closed-form expectation and prints
  * one line for SCALE.md. Default heap (build.sbt -Xmx8g) on purpose:
  * surviving the default is the point.
  *
  * Usage: `sbt "runMain graft.DepthProbe [depth]"` (default 10000).
  */
object DepthProbe {
  def main(args: Array[String]): Unit = {
    val depth = args.headOption.map(_.toInt).getOrElse(10000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = Seq(
      "the quick brown fox jumps over the lazy dog again and again today",
      "the quick brown fox jumps over the lazy dog again and again tomorrow",
      "partition pruning keeps a hundred terabyte scan honest at the metadata layer",
      "partition pruning keeps a hundred terabyte scan honest at the storage layer",
      "watermarks bound streaming state by event time not by row count")
    val dir = java.nio.file.Files.createTempDirectory("d15depthprobe").toFile
    try {
      // 5·depth docs; ids interleave groups so least/greatest in the
      // expansion is exercised, not vacuous.
      spark.range(0, base.length.toLong * depth)
        .select((col("id") % base.length).cast("int").as("ti"), col("id").as("doc_id"))
        .withColumn("text",
          element_at(typedLit(base), col("ti") + 1))
        .select(col("doc_id"), col("text"))
        .repartition(8)
        .write.mode("overwrite").parquet(s"${dir.getPath}/documents.parquet")
      val d = depth.toLong
      val expectWithin = base.length * (d * (d - 1) / 2)
      val expectCross = 2L * d * d // base pairs (0,1) and (2,3) qualify
      val expected = expectWithin + expectCross
      val t0 = System.nanoTime()
      val got = graft.ops.Dedup.d15PrefixJaccard(spark, dir.getPath).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"d15_depth_probe","depth":$depth,""" +
        f""""docs":${base.length * d},"rows":$got,"expected":$expected,""" +
        f""""sec":$sec%.1f}""")
      require(got == expected, s"row count $got != closed-form $expected")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).getOrElse(Array.empty).foreach(rm); f.delete(): Unit
      }
      rm(dir)
      spark.stop()
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered query runs on sf0.001 and its oracle (when
  * declared) exists. Value-level correctness is covered by the DuckDB
  * oracle gate (tools/check.py mirrors the driver); per-operator unit
  * specs live next to their modules.
  */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("oracleSql keys are a subset of queries") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracleSql without query impl: $extra")
  }

  test("every query is oracle-mapped except the two sketches (rows-only by design)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == Set("q30_approx_distinct", "q35_approx_percentile"),
      s"unexpected oracle-less queries: $missing")
  }

  test("q42: each stratum yields exactly min(25, stratum size) rows") {
    import org.apache.spark.sql.functions._
    val perStratum = SparkEntry.queries("q42_stratified_sample")(spark, dir)
      .groupBy("lang").agg(count(lit(1)).as("n"))
    val full = Tables.load(spark, dir, "documents")
      .groupBy("lang").agg(count(lit(1)).as("total"))
    val bad = perStratum.join(full, "lang")
      .filter(col("n") =!= least(lit(25L), col("total"))).count()
    assert(bad == 0)
  }

  test("q43: final running value per user equals the per-user cents sum") {
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, dir, "events")
    // The window orders by (ts, event_id), so "final" must be selected by
    // that SAME order — picking max event_id would silently assume ids
    // increase with time, which a regenerated fixture need not satisfy.
    val lastId = ev.groupBy("user_id")
      .agg(max_by(col("event_id"), struct(col("ts"), col("event_id")))
        .as("last_event"))
    val last = SparkEntry.queries("q43_running_total")(spark, dir)
      .join(lastId, "user_id")
      .filter(col("event_id") === col("last_event"))
      .select(col("user_id"), col("running_cents").as("final"))
    val direct = ev.groupBy("user_id")
      .agg(sum(floor(col("value") * 100).cast("long")).as("expected"))
    assert(last.join(direct, "user_id")
      .filter(col("final") =!= col("expected")).count() == 0)
  }

  test("t9: cardinalities are consistent (dup = words - distinct; bigrams bounded)") {
    import org.apache.spark.sql.functions._
    val bad = SparkEntry.queries("t9_repetition")(spark, dir)
      .filter(
        col("n_distinct_words") > col("n_words") ||
          col("n_dup_words") =!= col("n_words") - col("n_distinct_words") ||
          col("n_distinct_bigrams") > greatest(col("n_words") - 1, lit(0L)))
      .count()
    assert(bad == 0)
  }

  test("q46: exact-sum stddev/corr agree with Spark's built-ins to 1e-6") {
    import org.apache.spark.sql.functions._
    val builtin = Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(stddev(col("l_extendedprice")).as("sd"),
        corr(col("l_quantity"), col("l_extendedprice")).as("co"))
    // Tolerances cover q46's own output rounding (4dp / 6dp) — beneath
    // it, the exact-sum and Welford paths agree to full double precision.
    val bad = SparkEntry.queries("q46_stats")(spark, dir)
      .join(builtin, "l_returnflag")
      .filter(abs(col("stddev_price") - col("sd")) > 1e-3 ||
        abs(col("corr_qty_price") - col("co")) > 1e-5)
      .count()
    assert(bad == 0)
  }

  test("s6: rank-1 re-rank rows equal the multiband argmax (s2b)") {
    import org.apache.spark.sql.functions._
    // Collected-set compare: exceptAll's multiset rewrite trips an
    // INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND on the window+dropDuplicates
    // plan (Catalyst rewrite bug, not an engine-result issue).
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val top1 = rows(SparkEntry.queries("s6_ann_rerank")(spark, dir)
      .filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim")))
    val argmax = rows(SparkEntry.queries("s2b_ann_multiband")(spark, dir))
    assert(top1 == argmax)
  }

  test("q48: degenerate strata (single doc / constant length) yield NULL z, never NaN") {
    // The fixtures have no degenerate language groups, so the oracle gate
    // can't see this path. Unguarded, a single-row group divides by zero
    // (Spark NaN vs DuckDB NULL) and a constant group can sqrt a tiny
    // negative variance (Spark NaN vs a DuckDB hard error) — sdOfSums
    // guards both identically on both engines; pin the Spark half here.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("degenstrata").toString
    Seq((1L, "a", "solo", "web", 40L),
        (2L, "b", "const", "web", 7L), (3L, "c", "const", "web", 7L),
        (4L, "d", "ok", "web", 5L), (5L, "e", "ok", "web", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val z = SparkEntry.queries("q48_zscore")(spark, tmp).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    assert(z(1L).isEmpty && z(2L).isEmpty && z(3L).isEmpty,
      s"degenerate strata must be NULL: $z")
    assert(z(4L).exists(v => !v.isNaN) && z(5L).exists(v => !v.isNaN))
    assert(z(4L).contains(-z(5L).get), "two-point stratum must be symmetric")
  }

  test("d10: corpus exclusion and within-batch keeper dedup (fixture-invisible paths)") {
    // The driver fixtures contain no cross-source or within-batch
    // duplicate fingerprints, so the oracle gate passes d10 vacuously —
    // pin the two properties it exists for on a purpose-built corpus.
    // Normalization must match d6's (case/whitespace folding).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("incrdedup").toString
    Seq(
      (1L, "Already   known\ttext", "en", "src5", 18L), // corpus
      (2L, "already known text", "en", "src0", 18L),    // dup of corpus → excluded
      (3L, "fresh text a", "en", "src0", 12L),          // new, duplicated in batch
      (4L, "FRESH  text a", "en", "src0", 12L),         //   → keeper = min id (3)
      (5L, "corpus only", "en", "src7", 11L))           // not incoming → ignored
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("d10_incremental_dedup")(spark, tmp)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(3L), s"expected only the batch keeper of the novel text, got $out")
  }

  test("q35: GK percentile sketch stays within 1% of exact percentiles") {
    import org.apache.spark.sql.functions._
    // sf0.01 — the gate's own SF: these two queries are `no_oracle`
    // there (sketches aren't cross-engine reproducible), so this bound
    // IS their correctness check, at the same data the driver runs.
    val sfDir = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("q35_approx_percentile")(spark, sfDir)
    val exact = Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("e50"),
        expr("percentile(l_extendedprice, 0.95)").as("e95"))
    val joined = approx.join(exact, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(math.abs(r.getAs[Double]("ap50") - r.getAs[Double]("e50"))
        / r.getAs[Double]("e50") <= 0.01)
      assert(math.abs(r.getAs[Double]("ap95") - r.getAs[Double]("e95"))
        / r.getAs[Double]("e95") <= 0.01)
    }
  }

  test("q30: HLL estimates stay within 2% of exact distinct counts") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.01" // gate SF — see q35's note
    val approx = SparkEntry.queries("q30_approx_distinct")(spark, sfDir)
    val exact = Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
    val joined = approx.join(exact, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (ap, ep) = (r.getAs[Long]("approx_parts"), r.getAs[Long]("exact_parts"))
      val (ao, eo) = (r.getAs[Long]("approx_orders"), r.getAs[Long]("exact_orders"))
      assert(math.abs(ap - ep).toDouble / ep <= 0.02, s"parts: $ap vs $ep")
      assert(math.abs(ao - eo).toDouble / eo <= 0.02, s"orders: $ao vs $eo")
    }
  }

  test("null text: q38 drops, q39 buckets to 'test', t7 fingerprints null (oracle-aligned)") {
    // The driver fixtures carry no null text, so the oracle gate can't see
    // this path — pin Spark to the oracle SQL's null propagation here:
    // `||`/md5(NULL) excludes the row from q38, CASE-falls-through to
    // 'test' in q39, and array_to_string(NULL) yields a NULL fingerprint.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("nulltext").toString
    Seq((1L, Option("the value of a row"), "en", "web", 18L),
        (2L, Option.empty[String], "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val sampled = SparkEntry.queries("q38_hash_sample")(spark, tmp)
      .select("doc_id").as[Long].collect().toSet
    assert(!sampled.contains(2L), "null-text row must not be sampled")
    val splits = SparkEntry.queries("q39_split_assign")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(splits.getOrElse(("web", "test"), 0L) >= 1L,
      "null-text row must fall through to the last split")
    assert(splits.values.sum == 2L)
    val t7 = SparkEntry.queries("t7_scrub")(spark, tmp)
      .filter(col("doc_id") === 2L).collect().head
    assert(t7.isNullAt(t7.fieldIndex("n_redacted")))
    assert(t7.isNullAt(t7.fieldIndex("scrub_fingerprint")))
  }

  test("t10: posting cap drops corpus-common shingles; eval docs are never flagged " +
    "(fixture-invisible branches, purpose-built corpus)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val shared = "alpha beta gamma delta epsilon" // exactly one eval 5-gram
    val docs = Seq(
      (1L, "eval", shared + " zeta"),
      (10L, "train", shared + " one"),
      (11L, "train", shared + " two"),
      (12L, "train", shared + " three"),
      (20L, "train", "totally different words in here today"),
      (21L, "train", "too few tokens")
    ).toDF("doc_id", "source", "text")
    // Cap 2: the shared shingle posts to 3 train docs — over cap, dropped
    // entirely (a corpus-common phrase is boilerplate, not leakage).
    assert(graft.ops.TextAnalysis.contamination(docs, "eval", 2).isEmpty)
    // Cap 3: each train doc shares exactly the one shingle; the eval doc
    // itself and non-overlapping/short docs are never flagged.
    val got = graft.ops.TextAnalysis.contamination(docs, "eval", 3)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 1L), (11L, 1L), (12L, 1L)))
  }
}

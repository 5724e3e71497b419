package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Sampling, TextAnalysis}

/** Sequence packing (t11) and mixture sampling (q58) semantics on
  * constructed frames: exact agreement with an in-JVM reference of the
  * same md5 arithmetic, determinism under repartitioning, exclusion
  * edges, and the one-shuffle plan shape.
  */
class PackMixSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // --- t11 pack ---

  // (doc_id, chunk_idx, n_chunk_tokens) — insertion order scrambled: the
  // operator must order by (doc_id, chunk_idx) within each shard itself.
  private val chunks = Seq(
    (7L, 1L, 32L), (3L, 0L, 32L), (7L, 0L, 32L), (1L, 0L, 17L),
    (3L, 1L, 9L), (2L, 0L, 32L), (2L, 1L, 32L), (2L, 2L, 30L),
    (5L, 0L, 32L), (11L, 0L, 32L), (11L, 1L, 32L), (13L, 0L, 5L))

  private def refPack(rows: Seq[(Long, Long, Long)])
      : Set[(Long, Long, Long, Long, Long, Long)] = {
    val cap = 128L
    rows
      .map { case (d, c, n) =>
        (java.lang.Long.parseLong(md5hex(d.toString).substring(0, 2), 16)
          % 8L, d, c, n)
      }
      .groupBy(_._1).toSeq
      .flatMap { case (shard, rs) =>
        val sorted = rs.sortBy(r => (r._2, r._3))
        val offs = sorted.map(_._4).scanLeft(0L)(_ + _)
        sorted.zip(offs).map { case ((_, d, c, n), off) =>
          (d, c, shard, off / cap, off % cap, n)
        }
      }.toSet
  }

  test("pack ≡ in-JVM reference: shard, sequence and offset for every chunk") {
    val got = TextAnalysis.pack(chunks.toDF("doc_id", "chunk_idx", "n_chunk_tokens"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == refPack(chunks))
  }

  test("pack: token stream is partitioned exactly — offsets are gapless per shard") {
    val got = TextAnalysis.pack(chunks.toDF("doc_id", "chunk_idx", "n_chunk_tokens"))
      .select((col("seq") * TextAnalysis.PackCapacity + col("seq_off")).as("start"),
        col("shard"), col("n_chunk_tokens"))
      .groupBy("shard")
      .agg(max(col("start") + col("n_chunk_tokens")).as("endoff"),
        sum(col("n_chunk_tokens")).as("total"))
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty && got.forall { case (_, end, total) => end == total })
  }

  test("pack: result is independent of input partitioning") {
    val df = chunks.toDF("doc_id", "chunk_idx", "n_chunk_tokens")
    val a = TextAnalysis.pack(df).collect().toSet
    val b = TextAnalysis.pack(df.repartition(7)).collect().toSet
    assert(a == b)
  }

  test("pack plan: one hash exchange (by shard) — no global sort") {
    // A single-partition LocalTableScan satisfies any distribution, so
    // multi-partition input is needed for the exchange to be planned at
    // all (repartition itself adds a round-robin, not a hash, exchange).
    val p = TextAnalysis.pack(
      chunks.toDF("doc_id", "chunk_idx", "n_chunk_tokens").repartition(7))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p.take(1500))
    assert(!p.contains("rangepartitioning"), s"global sort crept in:\n${p.take(1500)}")
  }

  // --- q58 mixture sample ---

  private val weights = Seq("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2)

  // 40 docs: 20 en, 12 de, 6 fr, 2 xx (unweighted). Binding key is the
  // one minimizing n/w: en 40, de 40, fr 30 → fr keeps everything.
  private val docs: Seq[(Long, String, String)] =
    ((1 to 20).map(i => (i.toLong, "en", s"text en $i")) ++
      (21 to 32).map(i => (i.toLong, "de", s"text de $i")) ++
      (33 to 38).map(i => (i.toLong, "fr", s"text fr $i")) ++
      (39 to 40).map(i => (i.toLong, "xx", s"text xx $i")))

  private def refMixture(rows: Seq[(Long, String, String)],
      ws: Seq[(String, Double)]): Set[Long] = {
    val wm = ws.toMap
    val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val t = counts.collect { case (k, n) if wm.contains(k) => n / wm(k) }.min
    rows.collect {
      case (id, k, text) if wm.contains(k) &&
        java.lang.Long.parseLong(
          md5hex(s"$id:$text").substring(0, 8), 16).toDouble / 4294967296.0 <
          (t * wm(k)) / counts(k) => id
    }.toSet
  }

  test("mixtureSample ≡ in-JVM reference of the same md5/IEEE arithmetic") {
    val got = Sampling.mixtureSample(
      docs.toDF("doc_id", "lang", "text"), weights)
      .select("doc_id").as[Long].collect().toSet
    assert(got == refMixture(docs, weights))
  }

  test("mixtureSample: the binding language keeps every document") {
    val got = Sampling.mixtureSample(docs.toDF("doc_id", "lang", "text"), weights)
    assert(got.filter(col("lang") === "fr").count() == 6L)
  }

  test("mixtureSample: duplicate weight keys are rejected, not row-multiplied") {
    val e = intercept[IllegalArgumentException] {
      Sampling.mixtureSample(docs.toDF("doc_id", "lang", "text"),
        weights :+ ("en" -> 0.1))
    }
    assert(e.getMessage.contains("en"))
  }

  test("mixtureSample: unweighted and zero-weight keys are excluded") {
    val got = Sampling.mixtureSample(
      docs.toDF("doc_id", "lang", "text"), weights :+ ("xx" -> 0.0))
    assert(got.filter(col("lang") === "xx").count() == 0L)
  }

  test("mixtureSample: null text can never be sampled (q38 null contract)") {
    val withNull = docs.toDF("doc_id", "lang", "text")
      .unionByName(Seq((99L, "en", null: String)).toDF("doc_id", "lang", "text"))
    val got = Sampling.mixtureSample(withNull, weights)
      .select("doc_id").as[Long].collect().toSet
    assert(!got.contains(99L))
    // The null row still COUNTS toward en's n (21, not 20) — the fraction
    // denominator is corpus size, not hashable size. Reference with the
    // adjusted histogram; the null row itself can never pass (u = null).
    val wm = weights.toMap
    val counts = Map("en" -> 21L, "de" -> 12L, "fr" -> 6L)
    val t = counts.map { case (k, n) => n / wm(k) }.min
    val ref = docs.collect {
      case (id, k, text) if wm.contains(k) &&
        java.lang.Long.parseLong(
          md5hex(s"$id:$text").substring(0, 8), 16).toDouble / 4294967296.0 <
          (t * wm(k)) / counts(k) => id
    }.toSet
    assert(got == ref)
  }

  // --- q60 temperature mix ---

  private def refTemperature(rows: Seq[(Long, String, String)]): Set[Long] = {
    val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val t = counts.values.map(n => n / math.sqrt(n.toDouble)).min
    rows.collect {
      case (id, k, text) if
        java.lang.Long.parseLong(
          md5hex(s"$id:$text").substring(0, 8), 16).toDouble / 4294967296.0 <
          (t * math.sqrt(counts(k).toDouble)) / counts(k) => id
    }.toSet
  }

  test("temperatureMix ≡ in-JVM reference of the same sqrt/IEEE arithmetic") {
    val got = Sampling.temperatureMix(docs.toDF("doc_id", "lang", "text"))
      .select("doc_id").as[Long].collect().toSet
    assert(got == refTemperature(docs))
  }

  test("temperatureMix: the smallest language keeps everything; larger keep ~sqrt-proportional") {
    // n/w = sqrt(n), so min sqrt(n) binds: the SMALLEST language (xx, 2
    // docs) keeps every document — the low-resource boost by definition.
    val got = Sampling.temperatureMix(docs.toDF("doc_id", "lang", "text"))
    assert(got.filter(col("lang") === "xx").count() == 2L)
    // Kept fraction targets are f = sqrt(2)*sqrt(n)/n = sqrt(2/n):
    // monotone DECREASING in n — en's target 31.6% vs de's 40.8%. The
    // realized counts are hash-binomial around n*f, so assert the
    // structural bound instead of the point value: no language's kept
    // count exceeds its corpus count, and every language keeps >= 1 doc
    // at these sizes only if its target*n >= ~6 — just pin totals match
    // the in-JVM reference (exactness test above) and xx > 0 here.
    val kept = got.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept.getOrElse("xx", 0L) == 2L)
    assert(kept.forall { case (l, k) => k <= docs.count(_._2 == l) })
  }

  test("temperatureMix: result is independent of input partitioning") {
    val df = docs.toDF("doc_id", "lang", "text")
    val a = Sampling.temperatureMix(df).select("doc_id").as[Long].collect().toSet
    val b = Sampling.temperatureMix(df.repartition(5)).select("doc_id")
      .as[Long].collect().toSet
    assert(a == b)
  }

  // --- q59 token budget ---

  private def refBudget(rows: Seq[(Long, String, String)], budget: Long)
      : Set[(Long, String, Long, Long)] =
    rows
      .map { case (id, src, text) =>
        (src, md5hex(s"$id:$text"), id,
          text.split(" ").count(_.nonEmpty).toLong)
      }
      .filter(_._4 >= 1)
      .groupBy(_._1).toSeq
      .flatMap { case (src, rs) =>
        val sorted = rs.sortBy(r => (r._2, r._3))
        val cums = sorted.map(_._4).scanLeft(0L)(_ + _).tail
        sorted.zip(cums).collect {
          case ((_, _, id, n), cum) if cum <= budget => (id, src, n, cum)
        }
      }.toSet

  // Two sources; texts sized so the budget cuts mid-prefix in s1 and a
  // boundary-straddling doc in s2 is dropped while a later, smaller doc
  // still fits ONLY IF the op were bin-packing — it must NOT (prefix
  // semantics: once cum exceeds, every later doc in hash order is out
  // only when its own cum exceeds too).
  private val budgetDocs: Seq[(Long, String, String)] = Seq(
    (1L, "s1", "a b c d e"), (2L, "s1", "a b c"), (3L, "s1", "a b c d"),
    (4L, "s1", "x y"), (5L, "s2", "a b c d e f g h"), (6L, "s2", "a b"),
    (7L, "s2", "q"), (8L, "s2", ""), (9L, "s1", "   "))

  test("tokenBudget ≡ in-JVM reference: hash-order prefix per source, ceiling semantics") {
    val got = Sampling.tokenBudget(
      budgetDocs.toDF("doc_id", "source", "text"), budget = 8L)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == refBudget(budgetDocs, 8L))
    // The empty and whitespace-only docs never appear.
    assert(!got.exists(r => r._1 == 8L || r._1 == 9L))
  }

  test("tokenBudget: result is independent of input partitioning") {
    val df = budgetDocs.toDF("doc_id", "source", "text")
    val a = Sampling.tokenBudget(df, 8L).collect().toSet
    val b = Sampling.tokenBudget(df.repartition(5), 8L).collect().toSet
    assert(a == b)
  }

  test("mixtureSample: result is independent of input partitioning") {
    val df = docs.toDF("doc_id", "lang", "text")
    val a = Sampling.mixtureSample(df, weights).select("doc_id")
      .as[Long].collect().toSet
    val b = Sampling.mixtureSample(df.repartition(5), weights).select("doc_id")
      .as[Long].collect().toSet
    assert(a == b)
  }

  test("q61 epoch shuffle: a permutation — every doc once, per-shard " +
    "ranks contiguous from 1, and shards partition the corpus") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    val out = Sampling.q61EpochShuffle(spark, dir)
    assert(out.count() == docs.filter(col("text").isNotNull).count())
    assert(out.select("doc_id").distinct().count() == out.count())
    assert(out.filter(col("shard") < 0 || col("shard") > 15).count() == 0)
    // Ranks are 1..n_shard with no gaps: per shard, max == count.
    val bad = out.groupBy("shard")
      .agg(max("shard_rank").as("mx"), count(lit(1)).as("n"),
        min("shard_rank").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L)
    assert(bad.count() == 0)
    // Deterministic across physical plans.
    val again = Sampling.q61EpochShuffle(spark, dir).collect().toSet
    assert(out.collect().toSet == again)
  }
}

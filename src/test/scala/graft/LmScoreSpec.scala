package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextAnalysis

/** Bigram-LM quality scoring (t15) on constructed corpora: exact
  * hand-computed MLE probabilities, degenerate-document handling
  * (short / empty / null text), the monotone gibberish-vs-repetitive
  * sanity the filter exists for, and determinism under repartitioning.
  */
class LmScoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def score(rows: Seq[(Long, String)]): Map[Long, (Long, Option[Double])] =
    TextAnalysis.lmScore(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap

  test("hand-computed MLE bigram means: P(w2|w1) = c(w1 w2)/c(w1 ·), " +
    "position-ordered mean") {
    // Corpus bigrams: doc1 = (a,b),(b,a),(a,b); doc2 = (a,b),(b,c).
    // c(a b)=3, c(b a)=1, c(b c)=1; prefixes c(a ·)=3, c(b ·)=2.
    val out = score(Seq(1L -> "a b a b", 2L -> "a b c"))
    assert(out(1L) == ((3L, Some((1.0 + 0.5 + 1.0) / 3.0))))
    assert(out(2L) == ((2L, Some((1.0 + 0.5) / 2.0))))
  }

  test("degenerate docs: <2 tokens, empty, and null text score null " +
    "with n_bigrams 0 — and still appear in the output") {
    val out = score(Seq(1L -> "a b", 2L -> "solo", 3L -> "", 4L -> null))
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    // Doc 1's lone bigram is the only one in the corpus: P = 1/1.
    assert(out(1L) == ((1L, Some(1.0))))
    for (id <- Seq(2L, 3L, 4L)) assert(out(id) == ((0L, None)))
  }

  test("monotone sanity: a repetitive doc outscores a token-soup doc " +
    "in the same corpus — the filter's reason to exist") {
    // One contested prefix: c(x x)=9, c(x q)=1, c(x ·)=10 — the
    // dominant-bigram doc scores 0.9, the rare-bigram doc 0.1. (With
    // UNshared prefixes both would score 1.0 — every unique prefix is
    // 1-of-1 under MLE, which is why the mix matters.)
    val out = score(Seq(
      1L -> "x x x x x x x x x x",
      2L -> "x q"))
    // Expected value IS the operator's defined arithmetic: sequential
    // fold of nine 0.9s then one divide (≈0.9 + 1 ulp of drift).
    val fold1 = (1 to 9).foldLeft(0.0)((acc, _) => acc + 0.9) / 9.0
    assert(out(1L) == ((9L, Some(fold1))))
    assert(out(2L) == ((1L, Some(0.1))))
  }

  test("deterministic under repartitioning (fold order is pinned by " +
    "position, not arrival)") {
    val docs = (1L to 40L).map(i =>
      i -> Seq.tabulate(30)(j => s"w${(i * 7 + j * 13) % 11}").mkString(" "))
    val a = TextAnalysis.lmScore(docs.toDF("doc_id", "text"))
      .collect().map(_.toSeq).toSet
    val b = TextAnalysis.lmScore(docs.toDF("doc_id", "text").repartition(7))
      .collect().map(_.toSeq).toSet
    assert(a == b && a.size == 40)
  }

  test("fixture run: every document appears once; scores are in (0, 1]") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    val out = TextAnalysis.t15LmScore(spark, dir)
    assert(out.count() == docs.count())
    assert(out.filter(col("lm_score").isNotNull &&
      (col("lm_score") <= 0.0 || col("lm_score") > 1.0)).count() == 0)
    assert(out.filter(col("lm_score").isNotNull).count() > 0)
  }
}

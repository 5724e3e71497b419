package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextAnalysis

/** BM25 retrieval (t12) on constructed corpora: exact agreement with an
  * in-JVM reference of the same IEEE arithmetic (k1=1.2, b=0.75, ln-idf,
  * term-ordered sequential fold, round-6, doc_id tie-break), the
  * rarest-16 query-term budget, and determinism under repartitioning.
  */
class Bm25Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  // Mirror Spark's Round(HALF_UP over the decimal rendering of the
  // double) — java BigDecimal.valueOf goes through Double.toString,
  // exactly like Spark's Round expression.
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** In-JVM BM25 with the operator's exact operation order: rarest-m
    * query-term budget, per-term posting cap in (tf desc, dlen asc,
    * doc_id asc) impact order, and the per-(query, doc) sum folded in
    * QRANK order (the engine's pinned max-slot association order).
    */
  private def refBm25(corpus: Seq[(Long, String)], queries: Seq[(Long, String)],
      k: Int, m: Int = 16, cap: Int = 1000): Set[(Long, Long, Long, Double)] = {
    def toks(s: String) = s.split(" ").filter(_.nonEmpty).toSeq
    val tf = corpus.flatMap { case (d, t) => toks(t).map((d, _)) }
      .groupBy(identity).map { case (kk, v) => (kk, v.size.toLong) }
    val dlen = tf.groupBy(_._1._1).map { case (d, v) => (d, v.values.sum) }
    val nDocs = dlen.size.toLong
    val avgdl = dlen.values.sum.toDouble / nDocs.toDouble
    val dfm = tf.keys.groupBy(_._2).map { case (t, v) => (t, v.size.toLong) }
    def posting(term: String): Seq[Long] = dlen.keys.toSeq
      .filter(d => tf.contains((d, term)))
      .sortBy(d => (-tf((d, term)), dlen(d), d)).take(cap)
    queries.flatMap { case (qid, qtext) =>
      val qts = toks(qtext).distinct.filter(dfm.contains)
        .map(t => (t, dfm(t))).sortBy { case (t, d) => (d, t) }.take(m)
      val contrib = for {
        ((term, dfv), qrank) <- qts.zipWithIndex
        d <- posting(term)
      } yield (d, qrank,
        math.log(1.0 + (nDocs - dfv + 0.5) / (dfv + 0.5)) *
          (tf((d, term)) * 2.2) /
          (tf((d, term)) + 1.2 * (0.25 + 0.75 * dlen(d) / avgdl)))
      contrib.groupBy(_._1).toSeq
        .map { case (d, rows) =>
          (d, round6(rows.sortBy(_._2).map(_._3).foldLeft(0.0)(_ + _)))
        }
        .sortBy { case (d, s) => (-s, d) }.take(k).zipWithIndex
        .map { case ((d, s), i) => (qid, d, (i + 1).toLong, s) }
    }.toSet
  }

  private val corpus: Seq[(Long, String)] = Seq(
    (1L, "spark shuffle join partition broadcast"),
    (2L, "spark spark spark join filter"),
    (3L, "duck oracle hash gate compare compare"),
    (4L, "join shuffle shuffle partition skew salt"),
    (5L, "embedding cosine neighbor index probe"),
    (6L, "spark join gate probe salt"))

  private val queries: Seq[(Long, String)] = Seq(
    (100L, "spark join shuffle"),
    (101L, "probe index gate"))

  test("bm25 ≡ in-JVM reference: scores, ranks and ties on a constructed corpus") {
    val got = TextAnalysis.bm25(
        corpus.toDF("doc_id", "text"), queries.toDF("doc_id", "text"), 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == refBm25(corpus, queries, 3))
    // Sanity beyond equality: doc 1 holds all three query terms
    // (including the rarer "shuffle") and must outrank doc 2's
    // tf-saturated "spark spark spark" (k1 caps repetition gain).
    val top = got.collect { case (100L, d, 1L, _) => d }
    assert(top == Set(1L), s"expected doc 1 to top query 100, got $top")
  }

  test("bm25: rarest-16 query-term budget drops the commonest terms deterministically") {
    // 20 query terms t01..t20 with strictly increasing df: t_i appears in
    // docs 1..i (of 21 corpus docs). The budget must keep t01..t16 and
    // drop t17..t20 — so doc 21, which shares ONLY t17..t20 with the
    // query, must score nothing at all.
    val terms = (1 to 20).map(i => f"t$i%02d")
    val corp = (1 to 20).map { d =>
      (d.toLong, terms.drop(d - 1).mkString(" ") + " filler")
    } :+ (21L, (17 to 20).map(i => f"t$i%02d").mkString(" "))
    val q = Seq((200L, terms.mkString(" ")))
    val got = TextAnalysis.bm25(
        corp.toDF("doc_id", "text"), q.toDF("doc_id", "text"), 21)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == refBm25(corp, q, 21))
    assert(!got.exists(_._2 == 21L),
      "doc 21 shares only over-budget terms and must not be retrieved")
  }

  test("bm25: result is independent of input partitioning") {
    val c = corpus.toDF("doc_id", "text")
    val q = queries.toDF("doc_id", "text")
    val a = TextAnalysis.bm25(c, q, 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    val b = TextAnalysis.bm25(c.repartition(7), q.repartition(3), 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(a == b)
  }

  test("bm25: null/empty-text docs never match and don't count toward N or avgdl") {
    val c = (corpus ++ Seq((7L, ""), (8L, null.asInstanceOf[String])))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25(c, queries.toDF("doc_id", "text"), 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == refBm25(corpus, queries, 3))
  }

  test("bm25: posting cap keeps impact order, not doc_id order, past 1000 postings") {
    // 1100 docs share term "x" (past the 1000-posting cap): 1050 tf=1
    // docs with SMALL ids, 50 tf=2 docs with LARGE ids (2000+). The cap
    // ranks by (tf desc, dlen asc, doc_id asc), so every tf=2 doc must
    // survive despite its large id — a doc_id-ordered (or insertion-
    // ordered) cap would silently drop all of them. Their higher tf
    // then puts them at ranks 1..5 (doc_id tie-break within the group).
    val corp = (1 to 1050).map(i => (i.toLong, "x")) ++
      (0 until 50).map(i => ((2000 + i).toLong, "x x"))
    val q = Seq((9000L, "x"))
    val got = TextAnalysis.bm25(
        corp.toDF("doc_id", "text"), q.toDF("doc_id", "text"), 5)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == refBm25(corp, q, 5))
    assert(got.map(_._2) == Set(2000L, 2001L, 2002L, 2003L, 2004L),
      s"top-5 must be the first five high-tf docs, got ${got.map(_._2)}")
  }
}

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

  // ---- t16 importance weights (DSIR) — the sibling fold over hashed
  // bucket shares instead of bigram quotients.

  /** In-JVM reference of t16's exact arithmetic: md5-hex bucket,
    * global integer bucket counts, position-ordered share fold.
    */
  private def refImportance(rows: Seq[(Long, String, String)])
      : Map[Long, (Long, Option[Double])] = {
    def bucket(tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      Integer.parseInt(
        md.digest(tok.getBytes("UTF-8")).take(1).map("%02x".format(_))
          .mkString, 16)
    }
    val tk = rows.flatMap { case (id, lang, text) =>
      Option(text).getOrElse("").split(" ").filter(_.nonEmpty)
        .map(t => (id, lang == "en", bucket(t)))
    }
    val cntR = tk.groupBy(_._3).map { case (b, xs) => b -> xs.size }
    val cntT = tk.groupBy(_._3).map { case (b, xs) => b -> xs.count(_._2) }
    rows.map { case (id, _, text) =>
      val bs = Option(text).getOrElse("").split(" ").filter(_.nonEmpty)
        .map(bucket)
      id -> (if (bs.isEmpty) (0L, None)
             else (bs.length.toLong, Some(
               bs.foldLeft(0.0)((a, b) =>
                 a + cntT(b).toDouble / cntR(b).toDouble) / bs.length)))
    }.toMap
  }

  private def imp(rows: Seq[(Long, String, String)])
      : Map[Long, (Long, Option[Double])] =
    TextAnalysis.importanceWeights(rows.toDF("doc_id", "lang", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap

  test("t16 ≡ in-JVM reference on a mixed corpus incl. degenerate docs " +
    "(empty / null text, null lang as non-target)") {
    val rows = Seq(
      (1L, "en", "alpha beta alpha gamma"),
      (2L, "de", "gamma delta delta"),
      (3L, "en", "delta alpha"),
      (4L, "es", ""),
      (5L, null.asInstanceOf[String], "alpha alpha"),
      (6L, "en", null.asInstanceOf[String]))
    assert(imp(rows) == refImportance(rows))
  }

  test("t16: an all-target corpus weighs exactly 1.0 everywhere — every " +
    "bucket share is the exact integer quotient n/n") {
    val rows = Seq(
      (1L, "en", "a b c d e"),
      (2L, "en", "c d e f"),
      (3L, "en", "zz"))
    val out = imp(rows)
    assert(out.values.forall { case (n, w) => n > 0 && w.contains(1.0) })
  }

  test("t16 discriminates: target-vocabulary docs outweigh off-target " +
    "docs sharing no tokens (modulo bucket collisions, checked)") {
    val rows = Seq(
      (1L, "en", "red blue red blue"),
      (2L, "en", "red blue green"),
      (3L, "fr", "rouge bleu vert"),
      (4L, "fr", "rouge rouge bleu"))
    val ref = refImportance(rows)
    // The fixture premise: the two vocabularies land in disjoint
    // buckets (verified here, not assumed), so en buckets are pure.
    assert(ref(1L)._2.contains(1.0) && ref(3L)._2.contains(0.0))
    val out = imp(rows)
    assert(out == ref)
    assert(out(2L)._2.get > out(4L)._2.get)
  }

  test("t16 deterministic under repartitioning") {
    val rows = (1L to 30L).map(i =>
      (i, if (i % 3 == 0) "en" else "de",
        Seq.tabulate(20)(j => s"tok${(i * 5 + j * 11) % 17}").mkString(" ")))
    val a = TextAnalysis.importanceWeights(
      rows.toDF("doc_id", "lang", "text")).collect().map(_.toSeq).toSet
    val b = TextAnalysis.importanceWeights(
      rows.toDF("doc_id", "lang", "text").repartition(7))
      .collect().map(_.toSeq).toSet
    assert(a == b && a.size == 30)
  }
}

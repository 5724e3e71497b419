package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Hybrid

/** Pins the round-16 distinct-vector twin collapse in [[Hybrid]]'s
  * vector leg: the collapsed leg must reproduce the uncollapsed
  * per-query (cos_sim DESC, doc_id ASC) row_number EXACTLY — including
  * doc_id tie interleaving ACROSS corpus twin groups whose distinct
  * vectors collide at round-6 cosine, the one case the
  * strictly-better-count filter has to get right. (At sf10 the collapse
  * was also proven bit-identical against the pre-change engine output:
  * 125,000 rows, symmetric diff 0 — this suite keeps that property
  * pinned on hostile fixtures.)
  */
class HybridSpec extends AnyFunSuite {
  private val spark = SparkTest.session
  import spark.implicits._

  /** Uncollapsed reference formulation — the pre-round-16 leg shape. */
  private def bruteVecLeg(corpus: DataFrame, queries: DataFrame,
      emb: DataFrame, legK: Int): DataFrame = {
    val asD = (c: org.apache.spark.sql.Column) => transform(c, _.cast("double"))
    val e = emb.select(col("vec_id"), asD(col("embedding")).as("v"))
      .withColumn("n2",
        aggregate(transform(col("v"), x => x * x), lit(0.0), (a, x) => a + x))
    val cvec = corpus.select(col("doc_id"))
      .join(e, col("doc_id") === col("vec_id")).drop("vec_id")
    val qvec = queries.select(col("doc_id").as("query_id"))
      .join(e, col("query_id") === col("vec_id"))
      .select(col("query_id"), col("v").as("qv"), col("n2").as("qn2"))
    val vw = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("doc_id").asc)
    cvec.crossJoin(broadcast(qvec))
      .select(col("query_id"), col("doc_id"),
        round(graft.functions.Functions.dot_product(col("qv"), col("v")) /
          sqrt(col("qn2") * col("n2")), 6).as("cos_sim"))
      .withColumn("vec_rank", row_number().over(vw))
      .filter(col("vec_rank") <= legK)
      .select(col("query_id"), col("doc_id"), col("vec_rank"))
  }

  /** Collapsed leg, extracted from hybridRrf by fusing with an empty
    * lexical side is intrusive — instead compare the FULL fused output
    * of hybridRrf against a reference hybridRrf whose vector ranks come
    * from [[bruteVecLeg]], fused with the same RRF fold.
    */
  private def referenceRrf(corpus: DataFrame, queries: DataFrame,
      emb: DataFrame, legK: Int, k: Int): DataFrame = {
    val lex = graft.ops.TextAnalysis.bm25(corpus, queries, legK)
      .select(col("query_id"), col("doc_id"), col("rank").as("lex_rank"))
    val vec = bruteVecLeg(corpus, queries, emb, legK)
    val fw = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("doc_id").asc)
    lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("vec_rank")), lit(0.0))).as("rrf"))
      .withColumn("rank", row_number().over(fw).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"), col("rrf"))
  }

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    val cols = a.columns.map(col).toSeq
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"collapsed != brute:\n collapsed=${a.sort(cols: _*).collect().mkString("\n ")}" +
        s"\n brute=${b.sort(cols: _*).collect().mkString("\n ")}")
  }

  // A fixture engineered so distinct vectors COLLIDE at round-6 cosine:
  // docs 10/11 share vector [1,0]; docs 12/13 share [2,0] — a DIFFERENT
  // distinct vector with the SAME cosine (1.0) to any query, so the
  // top-k interleaves 10,11,12,13 by doc_id across two twin groups.
  // Doc 14 ([0,1], cosine 0) ranks after them; doc 15 has no embedding
  // (lexical-only candidate).
  private val corpusRows = Seq(
    (10L, "alpha beta gamma"), (11L, "alpha beta delta"),
    (12L, "alpha epsilon"), (13L, "beta epsilon"),
    (14L, "gamma delta"), (15L, "alpha alpha beta"))
  private val queryRows = Seq((1L, "alpha beta"), (2L, "alpha beta"))
  private val embRows = Seq(
    (10L, Array(1.0f, 0.0f)), (11L, Array(1.0f, 0.0f)),
    (12L, Array(2.0f, 0.0f)), (13L, Array(2.0f, 0.0f)),
    (14L, Array(0.0f, 1.0f)),
    (1L, Array(3.0f, 0.0f)), (2L, Array(3.0f, 0.0f)))

  test("collapsed hybridRrf ≡ uncollapsed reference on cross-group cosine ties") {
    val corpus = corpusRows.toDF("doc_id", "text")
    val queries = queryRows.toDF("doc_id", "text")
    val emb = embRows.toDF("vec_id", "embedding")
    assertSame(
      Hybrid.hybridRrf(corpus, queries, emb, legK = 3, k = 6),
      referenceRrf(corpus, queries, emb, legK = 3, k = 6))
  }

  test("collapsed hybridRrf ≡ uncollapsed reference when every vector is unique") {
    val corpus = corpusRows.toDF("doc_id", "text")
    val queries = queryRows.take(1).toDF("doc_id", "text")
    val emb = Seq(
      (10L, Array(1.0f, 0.1f)), (11L, Array(1.0f, 0.2f)),
      (12L, Array(0.9f, 0.3f)), (13L, Array(0.8f, 0.1f)),
      (14L, Array(0.1f, 1.0f)), (1L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    assertSame(
      Hybrid.hybridRrf(corpus, queries, emb, legK = 4, k = 8),
      referenceRrf(corpus, queries, emb, legK = 4, k = 8))
  }

  test("a twin group fully below the strictly-better cut contributes nothing") {
    // 4 docs share the TOP vector (gsize 4 ≥ legK=3): the second twin
    // group ([0.5,0]) has better=4 ≥ 3 and must be excluded wholesale,
    // yet the top group's docs must still tie-break 20<21<22 by doc_id.
    val corpus = Seq((20L, "a b"), (21L, "a c"), (22L, "b c"), (23L, "a"),
      (24L, "b"), (25L, "c")).toDF("doc_id", "text")
    val queries = Seq((3L, "a b c")).toDF("doc_id", "text")
    val emb = Seq(
      (20L, Array(1.0f, 0.0f)), (21L, Array(1.0f, 0.0f)),
      (22L, Array(1.0f, 0.0f)), (23L, Array(1.0f, 0.0f)),
      (24L, Array(0.5f, 0.0f)), (25L, Array(0.5f, 0.0f)),
      (3L, Array(2.0f, 0.0f))).toDF("vec_id", "embedding")
    assertSame(
      Hybrid.hybridRrf(corpus, queries, emb, legK = 3, k = 6),
      referenceRrf(corpus, queries, emb, legK = 3, k = 6))
  }
}

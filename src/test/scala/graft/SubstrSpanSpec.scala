package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** d12 (duplicated-substring spans) + d13 (span scrub) on constructed
  * corpora where the exact spans are known by construction, plus the
  * length-conservation invariant over real fixture data.
  *
  * Filler text comes from a global counter of unique 8-char tokens, so
  * no 40-char window of filler can ever collide with another window —
  * duplication exists exactly where a test plants it.
  */
class SubstrSpanSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  import spark.implicits._

  private var ctr = 0
  /** `n` globally-unique 8-char tokens, concatenated (8n chars). Every
    * token leads with the segment's `tag`: a window overhanging a
    * duplicated block by just 1..8 chars sees the NEXT segment's tag
    * first, so as long as each segment in a corpus has its own tag, the
    * overhang differs immediately and spans stop exactly at the block
    * edge. (A first draft used one shared prefix for all filler — the
    * operator then correctly flagged the 7 extra chars the fixture
    * accidentally duplicated.)
    */
  private def seg(tag: Char, n: Int): String = synchronized {
    (1 to n).map { _ => ctr += 1; f"$tag$ctr%07d" }.mkString
  }

  private def spansOf(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long)] =
    graft.ops.Dedup.substrSpans(docs.toDF("doc_id", "text"))
      .orderBy("doc_id", "span_start").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  private def scrubOf(docs: DataFrame): Seq[(Long, String, Long)] =
    graft.ops.Dedup.spanScrub(docs).collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)

  test("d12: a paragraph copied across two docs is flagged as exactly " +
    "that region in both (windows straddling the boundary stay unique)") {
    val common = seg('z', 8) // 64 chars
    val docs = Seq(
      1L -> (seg('a', 4) + common + seg('b', 4)),
      2L -> (seg('c', 4) + common + seg('d', 4)))
    // Flagged windows are those fully inside the copy: offsets 33..57,
    // covering chars 33..96 — the copied region, nothing more.
    assert(spansOf(docs) == Seq((1L, 33L, 96L, 64L), (2L, 33L, 96L, 64L)))
  }

  test("d12: two separately-duplicated regions that ABUT merge into one " +
    "island; their standalone occurrences span individually") {
    val c1 = seg('y', 8); val c2 = seg('z', 8)
    val docs = Seq(
      1L -> (seg('a', 4) + c1 + c2 + seg('b', 4)), // c1c2 adjacent: one span
      2L -> (seg('c', 4) + c1 + seg('d', 4)),
      3L -> (seg('e', 4) + c2 + seg('f', 4)))
    assert(spansOf(docs) == Seq(
      (1L, 33L, 160L, 128L), (2L, 33L, 96L, 64L), (3L, 33L, 96L, 64L)))
  }

  test("d12: within-doc repetition flags both occurrences as separate " +
    "spans; d13 excises both and keeps every unique segment") {
    val block = seg('k', 5) // 40 chars — exactly one window per occurrence
    val head = seg('h', 4); val mid = seg('m', 4); val tail = seg('t', 4)
    val text = head + block + mid + block + tail
    val docs = Seq(1L -> text)
    assert(spansOf(docs) == Seq((1L, 33L, 72L, 40L), (1L, 105L, 144L, 40L)))
    assert(scrubOf(docs.toDF("doc_id", "text")) ==
      Seq((1L, head + mid + tail, 80L)))
  }

  test("d12: a duplicated block STRADDLING the 16384-char segment-stride " +
    "boundary is still found exactly (K-1 overlap covers it)") {
    val block = seg('k', 5) // 40 chars
    // Doc 1 places the block at chars 16361..16400, crossing the first
    // segment's window range end (window 16384) mid-block.
    val docs = Seq(
      1L -> (seg('a', 2045) + block + seg('b', 8)),
      2L -> (seg('c', 4) + block + seg('d', 4)))
    assert(spansOf(docs) ==
      Seq((1L, 16361L, 16400L, 40L), (2L, 33L, 72L, 40L)))
  }

  test("d13: identical docs are fully covered — clean text is empty, " +
    "short/unique/null docs pass through untouched") {
    val dup = seg('p', 10) // 80 chars, twice
    val unique = seg('q', 6)
    val docs = Seq(
      (1L, Some(dup)), (2L, Some(dup)),         // whole-doc duplicates
      (3L, Some(unique)),                       // unique, len >= K
      (4L, Some("short one")),                  // below K: never flagged
      (5L, None: Option[String]))               // null text
      .toDF("doc_id", "text")
    val out = scrubOf(docs)
    assert(out(0) == ((1L, "", 80L)) && out(1) == ((2L, "", 80L)))
    assert(out(2) == ((3L, unique, 0L)))
    assert(out(3) == ((4L, "short one", 0L)))
    assert(out(4)._1 == 5L && out(4)._2 == null && out(4)._3 == 0L)
  }

  test("t13/t14: only corpus text matching EVAL docs is flagged — " +
    "corpus-internal duplication is d12's business, not t13's") {
    val evBlock = seg('v', 8)  // 64 chars, present in eval AND corpus
    val corpBlock = seg('w', 8) // 64 chars, duplicated corpus-internally
    val corpus = Seq(
      1L -> (seg('a', 4) + evBlock + seg('b', 4)),
      2L -> (seg('c', 4) + corpBlock + seg('d', 4)),
      3L -> (seg('e', 4) + corpBlock + seg('f', 4)))
      .toDF("doc_id", "text")
    val eval = Seq(9L -> (seg('g', 4) + evBlock + seg('h', 4)))
      .toDF("doc_id", "text")
    val spans = graft.ops.Dedup.contamSpans(corpus, eval)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Doc 1's eval-matching region only; docs 2/3 (corpus-internal
    // dup) and doc 9 (the eval doc itself) are absent.
    assert(spans == Seq((1L, 33L, 96L)))
    val clean = graft.ops.Dedup.spanScrub(corpus) // d13 view, for contrast
    assert(clean.filter(col("n_chars_removed") > 0).count() == 2) // docs 2,3
  }

  test("t14 over fixture data: eval docs are excluded, corpus docs are " +
    "conserved, and scrubbed chars equal t13's span lengths") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    val out = graft.ops.Dedup.t14ContamScrub(spark, dir)
    val nCorpus = docs.filter(!(col("source") <=> "src0")).count()
    assert(out.count() == nCorpus)
    assert(out.join(docs.filter(col("source") <=> "src0").select("doc_id"),
      "doc_id").count() == 0)
    val viol = out.join(docs.select(col("doc_id"), col("text")), "doc_id")
      .filter(col("text").isNotNull &&
        length(col("clean_text")) + col("n_chars_removed") =!= length(col("text")))
      .count()
    assert(viol == 0)
    val t13sum = graft.ops.Dedup.t13ContamSpans(spark, dir)
      .agg(sum("span_len")).collect()(0).getLong(0)
    val t14sum = out.agg(sum("n_chars_removed")).collect()(0).getLong(0)
    assert(t13sum == t14sum && t14sum > 0)
  }

  test("d13 over fixture data: chars are conserved (|clean| + removed " +
    "= |text|) and removed agrees with d12's span lengths per doc") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    val out = graft.ops.Dedup.d13SpanScrub(spark, dir)
    val viol = out.join(docs.select(col("doc_id"), col("text")), "doc_id")
      .filter(col("text").isNotNull &&
        length(col("clean_text")) + col("n_chars_removed") =!= length(col("text")))
      .count()
    assert(viol == 0)
    val perDoc = graft.ops.Dedup.d12SubstrSpans(spark, dir)
      .groupBy("doc_id").agg(sum(col("span_len")).as("sl"))
    val disagree = out.join(perDoc, Seq("doc_id"), "left")
      .filter(coalesce(col("sl"), lit(0L)) =!= col("n_chars_removed"))
      .count()
    assert(disagree == 0)
    // The fixtures genuinely contain copied passages — the operator is
    // not passing vacuously.
    assert(out.filter(col("n_chars_removed") > 0).count() > 0)
  }

  /** In-JVM reference winnow over the operator's exact formulation:
    * 40-char window 60-bit md5-prefix keys, minimum of every 8-wide
    * run, rightmost on ties, deduplicated.
    */
  private def refWinnow(docs: Seq[(Long, String)]): Set[(Long, Long, Long)] = {
    def gk(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    docs.flatMap { case (id, text) =>
      if (text.length < 40) Nil
      else {
        val grams = (1 to text.length - 39)
          .map(i => (i.toLong, gk(text.substring(i - 1, i + 39))))
        (0 to grams.size - 8).map { w =>
          val win = grams.slice(w, w + 8)
          val mg = win.map(_._2).min
          (id, win.filter(_._2 == mg).map(_._1).max, mg)
        }
      }
    }.toSet
  }

  private def winnowOf(docs: Seq[(Long, String)]): Set[(Long, Long, Long)] =
    graft.ops.Dedup.winnow(docs.toDF("doc_id", "text"))
      .collect().toSet[org.apache.spark.sql.Row]
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("d14 winnow ≡ in-JVM reference, including the rightmost-tie rule " +
    "on a run of identical windows") {
    // 'x'*60 yields 21 IDENTICAL 40-char windows — every winnow window
    // inside the run ties on gk and must resolve to its last offset.
    val docs = Seq(
      1L -> (seg('a', 10) + "x" * 60 + seg('b', 10)),
      2L -> seg('c', 30),
      3L -> seg('d', 5))
    assert(winnowOf(docs) == refWinnow(docs))
  }

  test("d14 guarantee: docs sharing a >= K+W-1 char verbatim block " +
    "share a selected fingerprint key; sub-window docs yield nothing") {
    val common = seg('z', 16) // 128 chars >> 40+8-1
    val docs = Seq(
      1L -> (seg('a', 6) + common + seg('b', 6)),
      2L -> (seg('c', 11) + common),
      4L -> seg('e', 5).take(46)) // 46 chars: 7 grams < W — no window
    val out = winnowOf(docs)
    val k1 = out.collect { case (1L, _, k) => k }
    val k2 = out.collect { case (2L, _, k) => k }
    assert(k1.toSet.intersect(k2.toSet).nonEmpty)
    assert(!out.exists(_._1 == 4L))
    assert(out == refWinnow(docs))
  }

  test("d14 over fixture data: selected density is the expected ~2/(W+1) " +
    "compression, and every doc long enough to have a window appears") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    val out = graft.ops.Dedup.d14Winnow(spark, dir)
    val nGrams = docs.filter(length(col("text")) >= 40)
      .agg(sum(length(col("text")) - lit(39))).collect()(0).getLong(0)
    val nSel = out.count()
    // 2/(W+1) = 0.222…; allow wide slack but pin the order of magnitude.
    assert(nSel > nGrams / 10 && nSel < nGrams * 2 / 5)
    val expectDocs = docs.filter(length(col("text")) >= 40 + 8 - 1).count()
    assert(out.select("doc_id").distinct().count() == expectDocs)
  }
}

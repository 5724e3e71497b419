package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.FuzzyJoin

/** q62 fuzzy join ≡ brute-force Levenshtein over all pairs — the FastSS
  * deletion-neighborhood blocking must lose no qualifying pair, the
  * twin collapse must expand duplicate-name groups exactly, and nulls /
  * empties must follow the oracle's three-valued-filter semantics.
  */
class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def reference(rows: Seq[(Long, String)]): Set[(Long, Long, Long)] =
    (for {
      (ka, na) <- rows if na != null
      (kb, nb) <- rows if nb != null && ka < kb
      d = lev(na, nb) if d <= 1
    } yield (ka, kb, d.toLong)).toSet

  private def run(rows: Seq[(Long, String)]): Set[(Long, Long, Long)] =
    FuzzyJoin.fuzzyPairs(rows.toDF("k", "name"))
      .as[(Long, Long, Long)].collect().toSet

  test("fuzzyPairs ≡ brute force on a hand-built corpus: substitution, insert, delete, duplicates, empty, null") {
    val rows = Seq[(Long, String)](
      (1L, "kitten"), (2L, "sitten"),           // substitution, dist 1
      (3L, "kitte"),                            // deletion of (1), dist 1
      (4L, "kittens"),                          // insertion on (1), dist 1
      (5L, "kitten"),                           // exact duplicate of (1)
      (6L, "dog"), (7L, "dig"), (8L, "dogs"),   // separate cluster
      (9L, ""), (10L, "a"),                     // empty ↔ 1-char, dist 1
      (11L, null), (12L, null),                 // nulls match nothing
      (13L, "unrelated-long-name"))
    assert(run(rows) == reference(rows))
  }

  test("fuzzyPairs ≡ brute force on generated near-miss names incl. heavy duplication") {
    // Names drawn from a tight alphabet so distance-1 pairs are dense,
    // plus every name duplicated 0-3 times (twin-collapse expansion).
    val rng = new scala.util.Random(62)
    val base = Seq.fill(40)(Seq.fill(3 + rng.nextInt(3))(
      ('a' + rng.nextInt(3)).toChar).mkString)
    val rows = base.zipWithIndex.flatMap { case (n, i) =>
      (0 to rng.nextInt(3)).map(c => ((i * 10 + c).toLong, n))
    }
    assert(run(rows) == reference(rows))
  }

  test("q62 on the fixture: every supplier-number pair differing in one digit, canonical and exact") {
    val got = FuzzyJoin.q62FuzzyJoin(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect().toSet
    val names = Tables.load(spark, "/root/testdata/sf0.001", "supplier")
      .select($"s_suppkey", $"s_name").as[(Long, String)].collect().toSeq
    assert(got == reference(names))
    assert(got.nonEmpty && got.forall { case (a, b, d) => a < b && d == 1L })
  }

  test("native deletion_keys ≡ composed HOF form: values AND order, incl. unicode/repeats/empty") {
    import org.apache.spark.sql.functions.col
    val names = Seq(
      "", "a", "aa", "ab", "aab", "banana", "kitten",
      "FAC00035", "FAC00035X", "Supplier#000000001",
      "héllo", "ééé", "日本語テキスト", "a日b", "𝒜𝒷𝒸", // astral-plane codepoints
      "  spaced  ", "\ttab\n", "ZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZ")
    val df = names.toDF("name")
    val native = df.select(graft.functions.DeletionKeys.deletionKeys(col("name")).as("ks"))
      .as[Seq[String]].collect()
    val composed = df.select(FuzzyJoin.deletionKeysComposed(col("name")).as("ks"))
      .as[Seq[String]].collect()
    // Seq equality pins ORDER too (identity key first, deletions in
    // character-position order, first-occurrence dedup) — q62's
    // min-shared-key rule and the sf-gate hashes depend on the values,
    // the order pin makes any future divergence loud.
    assert(native.toSeq == composed.toSeq)
    // Structure: identity key leads, every key is distinct, deletions
    // are one char shorter (codepoint count, not UTF-16 units).
    names.zip(native).foreach { case (n, ks) =>
      assert(ks.head == n)
      assert(ks.distinct == ks)
      val cp = n.codePointCount(0, n.length)
      assert(ks.tail.forall(k => k.codePointCount(0, k.length) == cp - 1))
    }
  }
}

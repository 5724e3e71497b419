package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Kmeans

/** Branch coverage the oracle gate can't give k-means: the fixtures keep
  * all 8 cells populated through every iteration (probed via the oracle's
  * own CTE chain), so the empty-cell keep-centroid branch is dead there —
  * a broken implementation that dropped empty cells would still
  * hash-match. This spec builds the classic duplicate-seed corpus where a
  * cell MUST empty and its kept centroid later captures points.
  * (The other subtle branch — floor vs truncate on negative component
  * sums — IS fixture-exercised: 245 negative non-divisible sums in round
  * 1 at sf0.001 alone, so the oracle gate pins it.)
  */
class KmeansSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session

  test("empty cell keeps its centroid and can re-capture points (duplicate seeds)") {
    import spark.implicits._
    // k=2 with identical seeds at the origin: every point ties to cell 0
    // in round 1 (tie-break = smallest cell), so cell 1 empties. The far
    // cluster then drags c0 away while the kept c1 stays at the origin —
    // by round 2 the origin points belong to cell 1. Dropping empty
    // cells instead would leave everything in cell 0 forever.
    val pts = Seq(
      (0L, Seq(0L, 0L, 0L, 0L)),
      (1L, Seq(0L, 0L, 0L, 0L)), // duplicate seed
      (2L, Seq(100L, 0L, 0L, 0L)),
      (3L, Seq(100L, 0L, 0L, 0L)))
    val e = pts.toDF("id", "q")
    val init = pts.take(2)
    val (assigned, cents) = Kmeans.lloyd(e, init, iters = 2, dim = 4)
    val byId = assigned.select("id", "cell").as[(Long, Long)].collect().toMap
    assert(byId(0L) == 1L && byId(1L) == 1L,
      s"origin points must land in the kept empty cell: $byId")
    assert(byId(2L) == 0L && byId(3L) == 0L)
    val cmap = cents.toMap
    assert(cmap(1L) == Seq(0L, 0L, 0L, 0L), "emptied cell keeps its seed centroid")
    assert(cmap(0L).head == 100L, s"cell 0 converges onto the far cluster: $cmap")
  }

  test("zero iterations = assignment to the init centroids, exact integer distances") {
    import spark.implicits._
    val pts = Seq(
      (0L, Seq(0L, 0L)), (1L, Seq(10L, 0L)),
      (2L, Seq(2L, 0L)), (3L, Seq(7L, 1L)))
    val (assigned, cents) = Kmeans.lloyd(pts.toDF("id", "q"),
      pts.take(2), iters = 0, dim = 2)
    assert(cents == pts.take(2))
    val got = assigned.select("id", "cell", "dist").as[(Long, Long, Long)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(2L) == ((0L, 4L)))   // 2² vs 8² → cell 0
    assert(got(3L) == ((1L, 10L)))  // 3²+1 vs 7²+1 → cell 1
  }

  test("trainCentroids returns k refined centroids consumable as IVF cells") {
    val cents = Kmeans.trainCentroids(spark, "/root/testdata/sf0.001")
    assert(cents.map(_._1) == (0L until Kmeans.K.toLong))
    assert(cents.forall(_._2.length == Kmeans.Dim))
    // Training moved at least one centroid off its seed vector.
    val init = Kmeans.trainCentroids(spark, "/root/testdata/sf0.001", iters = 0)
    assert(cents != init, "3 Lloyd's rounds must refine the seed centroids")
  }

  test("s3 consumes trained centroids: same operator shape, top-k per query") {
    import spark.implicits._
    val out = graft.ops.Similarity.s3IvfAnnTrained(spark, "/root/testdata/sf0.001")
      .select("query_id", "rank").as[(Long, Long)].collect()
    val perQuery = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(perQuery.keySet == (8L to 12L).toSet, s"5 probe queries: ${perQuery.keySet}")
    assert(perQuery.values.forall(r => r == (1L to r.length) && r.length <= 3),
      "dense ranks 1..k per query")
  }
}

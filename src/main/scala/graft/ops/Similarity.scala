package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.load

/** Similarity search over the `embeddings` table (`array<float>` column).
  *
  * Two paths, per the standard ANN playbook:
  *   - s1: brute-force cosine top-k for a small query set — broadcast the
  *     queries against the corpus scan (one pass, no shuffle of the corpus;
  *     at 100 TB this is the exact-answer baseline and stays a map-side
  *     broadcast join + per-partition top-k via window).
  *   - s2: LSH-bucketed ANN — a sign-bit bucket key turns all-pairs into
  *     within-bucket pairs (the IVF/LSH scale path; buckets shard the
  *     shuffle key space).
  *
  * All float math is widened to double and summed sequentially, which is
  * bit-identical to DuckDB's `list_cosine_similarity(CAST … AS DOUBLE[]))`
  * (verified empirically), so the oracle compare is exact.
  */
object Similarity {

  /** Sequential-double cosine similarity — the native codegen'd
    * expression ([[graft.functions.CosineSimilarity]]): one fused loop
    * instead of three array-lambda passes, same bits.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.Functions.cosine_sim(a, b)

  /** Composed-builtins form of [[cosine]] — kept as the semantic spec the
    * native expression is tested bit-identical against.
    */
  def cosineComposed(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x)
    val nb = aggregate(transform(b, x => x * x), lit(0.0), (acc, x) => acc + x)
    dot / sqrt(na * nb)
  }

  /** Composed-builtins form of the double squared-L2 kernel — kept as the
    * semantic spec [[graft.functions.SqDistDouble]] is tested bit-identical
    * against (FunctionsSpec): the same sequential left-to-right fold, so
    * swapping forms cannot move a hash-compared result.
    */
  def sqDistDoubleComposed(a: Column, b: Column): Column = aggregate(
    zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** DuckDB-side cosine over float-list columns, widened to double. */
  def cosineSql(a: String, b: String): String =
    s"list_cosine_similarity(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[]))"

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  private val NQueries = 3
  private val TopK = 5

  /** Squared norm, same sequential recurrence as the cosine kernel. */
  private def sqNorm(v: Column): Column =
    aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x)

  /** s1 — brute-force cosine top-k: query vectors (vec_id < NQueries)
    * against the full corpus, k best by (similarity desc, vec_id asc).
    *
    * Norms are hoisted out of the pair loop: each vector's ‖·‖² is
    * computed once in the scan, and the per-pair kernel is only the
    * native dot product — for q queries that removes 2/3 of the
    * per-pair flops. `dot / sqrt(na * nb)` keeps the exact expression
    * tree of the fused kernel, so results are bit-identical.
    */
  def s1KnnCosine(s: SparkSession, dir: String): DataFrame = {
    val e = load(s, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("n2", sqNorm(col("v")))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("n2").as("qn2"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(graft.functions.Functions.dot_product(col("qv"), col("v")) /
          sqrt(col("qn2") * col("n2")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), col("cos_sim"))
  }

  /** Ingest-side normalization: persist unit vectors (and the norm) once
    * so every query-time similarity is a bare dot product — the storage
    * pattern for corpora queried repeatedly. Not bit-identical to
    * [[cosine]] (division before vs after the dot changes rounding), so
    * results come from one convention end-to-end, never mixed.
    */
  def withUnitNorm(e: DataFrame, vecCol: String): DataFrame = {
    val norm = sqrt(sqNorm(col(vecCol)))
    // Zero-norm guard: an all-zero embedding (upstream encoder failure
    // or padding) would otherwise emit 0.0/0.0 = NaN components and
    // silently poison every downstream dot product (review-caught).
    // The zero vector is kept AS the unit vector — its dot with
    // anything is 0, the "similar to nothing" answer a zero embedding
    // should give.
    e.withColumn("norm", norm)
      .withColumn("unit_vec",
        when(col("norm") === 0.0, col(vecCol))
          .otherwise(transform(col(vecCol), x => x / col("norm"))))
  }

  private val NBuckBits = 6

  /** Sign-bit LSH bucket: bit i set iff component i is positive. */
  private[graft] def buckets(v: Column): Column =
    (1 to NBuckBits).map(i =>
      when(element_at(v, i) > 0, lit(1L << (i - 1))).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Single-table sign-bucket rows with bucket population outside
    * [2, maxBucket] dropped — the same window-count cap as
    * [[cappedBands]], applied to the one-table layout s2/d8 use.
    * Singleton buckets never emit pairs anyway, so the ≥2 side only
    * prunes; the ≤maxBucket side is the scale guard: a degenerate
    * bucket (dense embedding region at 100× corpus) contributes ZERO
    * pairs instead of an O(pop²) task. The count is a window over the
    * bucket key, so the frame still reaches the self-join through ONE
    * scan and ONE (bucket) exchange that both join sides reuse.
    */
  private[graft] def cappedSignBuckets(e: DataFrame,
      maxBucket: Int = MaxBucket): DataFrame =
    e.withColumn("n_bucket",
        count(lit(1)).over(Window.partitionBy("bucket")))
      .filter(col("n_bucket").between(2, maxBucket))
      .drop("n_bucket")

  /** s2 — LSH-bucketed ANN: nearest neighbor within the same sign-bit
    * bucket for every vector (approximate — bucket boundaries lose some
    * true neighbors, which is the accuracy/cost trade the bucket count
    * tunes). Single-table layout: 6 bits ⇒ ≤64 buckets, which keeps
    * recall high on a small corpus; the per-bucket population cap
    * ([[cappedSignBuckets]]) bounds the within-bucket join so a hot
    * bucket degrades recall, never cost. [[s2bAnnMultiband]] remains
    * the scale default (more bits shrink mean population 64×, OR'd
    * tables buy the recall back).
    */
  def s2AnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = cappedSignBuckets(
      load(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .withColumn("bucket", buckets(col("v"))))
    // argmax per query via max_by (partial+final agg — no sort-window
    // shuffle); tie-break = smallest neighbor id, so the order key is
    // (cos_sim, -vec_id) maximized.
    e.as("a")
      .join(e.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"),
        col("a.bucket").as("bucket"),
        round(cosine(col("a.v"), col("b.v")), 6).as("cos_sim"))
      .groupBy(col("query_id"))
      .agg(max_by(
        struct(col("neighbor_id"), col("bucket"), col("cos_sim")),
        struct(col("cos_sim"), (-col("neighbor_id")).as("neg_id"))).as("best"))
      .select(col("query_id"), col("best.neighbor_id"), col("best.bucket"),
        col("best.cos_sim"))
  }

  // --- Multi-table (banded) sign LSH: the scale-safe default. -----------
  //
  // One table of NBuckBits=6 sign bits caps out at 64 buckets: at 100×
  // corpus the within-bucket self-join is O((n/64)²) per bucket and a
  // dense region of embedding space hot-spots one task. The banded form
  // fixes both knobs at once:
  //   - BandBits (12) sign bits per table ⇒ 4096 buckets per table, so
  //     mean bucket population shrinks 64× and the quadratic term with it;
  //   - BandTables (4) tables over disjoint component ranges, OR'd —
  //     a pair is a candidate if it collides in ANY table — which buys
  //     back the recall the narrower buckets lose;
  //   - MaxBucket caps the population a bucket may have and still emit
  //     pairs (mirrors d4's MaxPostings): a degenerate bucket (all-equal
  //     region, adversarial corpus) contributes ZERO pairs instead of a
  //     quadratic task, making worst-case cost linear in corpus size.
  private[ops] val BandBits = 12
  private[ops] val BandTables = 4
  private[ops] val MaxBucket = 1000

  /** Per-table sign-bucket keys: element `b` is the bucket of table `b`,
    * built from sign bits of components [b·bits+1, (b+1)·bits]. Vectors
    * must have ≥ bits·nTables dimensions (48 at the defaults) — a
    * shorter vector fails fast with ANSI's INVALID_ARRAY_INDEX; pass
    * smaller (bits, nTables) for low-dimensional embeddings.
    */
  private[ops] def bandBuckets(v: Column, bits: Int, nTables: Int): Column =
    array((0 until nTables).map { b =>
      (1 to bits).map(i =>
        when(element_at(v, b * bits + i) > 0, lit(1L << (i - 1))).otherwise(lit(0L)))
        .reduce(_ + _)
    }: _*)

  /** Rows exploded into (row, tbl, bucket) band memberships, keeping only
    * buckets whose population is in [2, maxBucket]. The cap is a window
    * count over (tbl, bucket) — NOT a separate aggregate joined back —
    * so the frame is computed with ONE scan and ONE shuffle: the band
    * explode and bucket math sit below the (tbl, bucket) exchange, the
    * downstream self-join partitions by the same keys (no new exchange),
    * and both join sides reuse the single exchange (the d2 lesson:
    * identical shuffle subtrees dedup; broadcast never does).
    */
  private[ops] def cappedBands(e: DataFrame, idCol: String, vecCol: String,
      bits: Int = BandBits, nTables: Int = BandTables,
      maxBucket: Int = MaxBucket): DataFrame = {
    // posexplode_outer, not posexplode: the plain generator lets
    // InferFiltersFromGenerate substitute the whole bucket-math array
    // into an inferred `size(arr) > 0` filter below this projection,
    // doubling the per-row work (the d4 lesson). The array is a non-null
    // 4-element literal, so the row sets are identical.
    val banded = e
      .select(col(idCol), col(vecCol),
        posexplode_outer(bandBuckets(col(vecCol), bits, nTables))
          .as(Seq("tbl", "bucket")))
    banded
      .withColumn("n_bucket",
        count(lit(1)).over(Window.partitionBy("tbl", "bucket")))
      .filter(col("n_bucket").between(2, maxBucket))
      .drop("n_bucket")
  }

  /** Unordered candidate pairs (idCol_a < idCol_b) colliding in ≥1 band
    * table, deduped across tables — the library-surface blocking
    * primitive (the oracled operators s2b/d8b layer scoring on the same
    * join; the skew tests pin the population-cap bound on it).
    */
  def multibandPairs(e: DataFrame, idCol: String, vecCol: String,
      bits: Int = BandBits, nTables: Int = BandTables,
      maxBucket: Int = MaxBucket): DataFrame = {
    val c = cappedBands(e, idCol, vecCol, bits, nTables, maxBucket)
    c.as("a")
      .join(c.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as(s"${idCol}_a"), col(s"b.$idCol").as(s"${idCol}_b"),
        col(s"a.$vecCol").as(s"${vecCol}_a"), col(s"b.$vecCol").as(s"${vecCol}_b"))
      .dropDuplicates(s"${idCol}_a", s"${idCol}_b")
  }

  // --- Exact twin collapse over the capped-band family (round 16) -----
  //
  // The population caps here are WHOLE-BUCKET filters — [2, MaxBucket]
  // on a bucket's TOTAL membership, `filter(between(...))`, never a
  // row_number truncation inside a bucket — so they weight exactly
  // (sum(mult) over hub rows ≡ count(1) over member rows, Long for
  // Long) and the family collapses like d4: band math and cosine run
  // once per DISTINCT embedding value, member results expand back
  // through group membership. (An earlier NOTES entry mislabeled these
  // caps as member-level truncations; reading the code shows the cap
  // drops whole buckets, which is the weightable case.) Twins share
  // every band bucket — banding is a pure function of the vector — so
  // co-occurrence decisions are group-level: if groups A and B share a
  // surviving bucket, EVERY cross member pair co-occurs there, and the
  // score round(cosine, 6) is bit-identical for all of them. Gated per
  // corpus on [[Kmeans.embTwinGate]] (the memoized embeddings
  // duplication probe the Lloyd's collapse already uses); unique
  // corpora keep the original single-pass member-level plans.

  /** One row per distinct vector value: `(vecCol, idCol = min member
    * id, members sorted asc, mult)`. Persisted — every consumer reads
    * it at least twice (banding + membership expansion).
    */
  private[ops] def vecHub(e: DataFrame, idCol: String, vecCol: String): DataFrame =
    OpCaches.persisted(e
      .groupBy(col(vecCol))
      .agg(min(col(idCol)).as(idCol),
        sort_array(collect_list(col(idCol))).as("members"),
        count(lit(1)).as("mult")))

  /** [[cappedBands]] over hub rows: identical band explode and window
    * shape, with the bucket population as the mult-weighted sum.
    */
  private[ops] def cappedBandsGrouped(hub: DataFrame, idCol: String,
      vecCol: String, bits: Int = BandBits, nTables: Int = BandTables,
      maxBucket: Int = MaxBucket): DataFrame = {
    val banded = hub
      .select(col(idCol), col(vecCol), col("mult"),
        posexplode_outer(bandBuckets(col(vecCol), bits, nTables))
          .as(Seq("tbl", "bucket")))
    banded
      .withColumn("n_bucket",
        sum(col("mult")).over(Window.partitionBy("tbl", "bucket")))
      .filter(col("n_bucket").between(2, maxBucket))
      .drop("n_bucket")
  }

  /** Unordered candidate GROUP pairs from grouped capped bands, deduped
    * across tables, scored once: `(ga, gb, cos_sim)` with ga ≤ gb;
    * a self pair (ga = gb) appears iff the group has ≥ 2 members and
    * one of its buckets survives the cap — exactly when the direct
    * member-level join would emit within-group pairs. min() over the
    * per-table copies is pure dedup (scores are bit-identical).
    */
  private[ops] def groupPairs(c: DataFrame, idCol: String, vecCol: String): DataFrame =
    c.as("a")
      .join(c.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          (col(s"a.$idCol") < col(s"b.$idCol") ||
            (col(s"a.$idCol") === col(s"b.$idCol") && col("a.mult") >= 2)))
      .select(col(s"a.$idCol").as("ga"), col(s"b.$idCol").as("gb"),
        round(cosine(col(s"a.$vecCol"), col(s"b.$vecCol")), 6).as("cs"))
      .groupBy(col("ga"), col("gb")).agg(min(col("cs")).as("cos_sim"))

  /** Per-query-group top candidate members: directs [[groupPairs]] both
    * ways, attaches each candidate group's first `keep` member ids
    * (members are sorted asc and ties break by smallest id, so no
    * later member of a group can enter a global top-`keep`), and keeps
    * the global top `keep` per query group by (score desc, id asc).
    * Output: one row per query group — `(gq, cand)` with `cand` a
    * rank-sorted array of `(rk, nid, cs)` structs, length ≤ keep.
    */
  private def topCandidates(gp: DataFrame, hub: DataFrame, idCol: String,
      keep: Int): DataFrame = {
    val directed = gp.select(col("ga").as("gq"), col("gb").as("gc"), col("cos_sim"))
      .union(gp.filter(col("ga") =!= col("gb"))
        .select(col("gb").as("gq"), col("ga").as("gc"), col("cos_sim")))
    val nm = directed
      .join(hub.select(col(idCol).as("gc"),
        slice(col("members"), 1, keep).as("mc")), Seq("gc"))
      .select(col("gq"), explode(col("mc")).as("nid"), col("cos_sim"))
    val w = Window.partitionBy("gq")
      .orderBy(col("cos_sim").desc, col("nid").asc)
    nm.withColumn("rk", row_number().over(w)).filter(col("rk") <= keep)
      .groupBy("gq")
      .agg(sort_array(collect_list(
        struct(col("rk"), col("nid"), col("cos_sim").as("cs")))).as("cand"))
  }

  /** s2b — multi-table LSH ANN: per vector, the best neighbor among
    * candidates from any band table. Directed collisions feed a max_by
    * argmax per query (partial+final agg, no sort window); a pair
    * colliding in several tables yields identical (payload, order-key)
    * rows, so duplicates cannot flip the argmax and no pre-dedup pass is
    * needed. Vectors whose every bucket is singleton (or over the cap)
    * have no candidates and are absent — the recall/cost trade the
    * (bits, tables) pair tunes.
    */
  def s2bAnnMultiband(s: SparkSession, dir: String): DataFrame = {
    val e = load(s, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    s2bAnnMultibandImpl(e, collapse = Kmeans.embTwinGate(s, dir))
  }

  /** TWIN COLLAPSE (round 16, see the family note above): the argmax of
    * (cos_sim, -neighbor_id) over a query member's candidates is
    * derivable from the GROUP-level top-2 — all members of a query
    * group share one candidate member list (ordered by score desc, id
    * asc), each member just excludes ITSELF, and at most one of the
    * top-2 entries can be the member — so the per-member best is the
    * first top-2 entry that isn't the member. A query whose only
    * candidate entry is itself (impossible: a surviving self pair
    * implies ≥ 2 members, so the top-2 holds a second id) would drop
    * out, exactly like a direct query with no candidates.
    */
  private[graft] def s2bAnnMultibandImpl(e: DataFrame, collapse: Boolean): DataFrame = {
    if (collapse) {
      val hub = vecHub(e, "vec_id", "v")
      val top = topCandidates(
        groupPairs(cappedBandsGrouped(hub, "vec_id", "v"), "vec_id", "v"),
        hub, "vec_id", keep = 2)
      // when(isNotNull, ..) widens nullability back to the direct
      // path's (d4's expansion precedent: analysis-time schema parity).
      return hub.select(col("vec_id").as("gq"), col("members")).join(top, Seq("gq"))
        .select(explode(col("members")).as("qx"), col("cand"))
        .select(col("qx"),
          filter(col("cand"), x => x.getField("nid") =!= col("qx")).as("c2"))
        .filter(size(col("c2")) >= 1)
        .select(when(col("qx").isNotNull, col("qx")).as("query_id"),
          element_at(col("c2"), 1).getField("nid").as("neighbor_id"),
          element_at(col("c2"), 1).getField("cs").as("cos_sim"))
    }
    val c = cappedBands(e, "vec_id", "v")
    c.as("a")
      .join(c.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"),
        round(cosine(col("a.v"), col("b.v")), 6).as("cos_sim"))
      .groupBy(col("query_id"))
      .agg(max_by(
        struct(col("neighbor_id"), col("cos_sim")),
        struct(col("cos_sim"), (-col("neighbor_id")).as("neg_id"))).as("best"))
      .select(col("query_id"), col("best.neighbor_id"), col("best.cos_sim"))
  }

  private[ops] val RerankK = 3

  /** s6 — ANN with exact re-rank: the production two-stage retrieval
    * shape. Stage 1 (recall): capped multiband LSH proposes candidates —
    * cost bounded linear by the population cap. Stage 2 (precision):
    * exact cosine over candidates only, top-k per query by a rank window
    * (WindowGroupLimit keeps the per-group sort map-bounded). A pair
    * colliding in several band tables scores identically, but k>1 means
    * duplicates would occupy ranks — so candidates dedup on
    * (query, neighbor) BEFORE ranking, a shuffle that carries an 8-byte
    * score rather than two vectors.
    */
  def s6AnnRerank(s: SparkSession, dir: String): DataFrame = {
    val e = load(s, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    s6AnnRerankImpl(e, collapse = Kmeans.embTwinGate(s, dir))
  }

  /** TWIN COLLAPSE (round 16, see the family note above): after the
    * (query, neighbor) dedup, every member of a query group ranks the
    * SAME candidate member list (score desc, id asc) minus itself — so
    * the group-level top-(K+1) determines every member's top-K: drop
    * the member if present (at most one entry can be it), take the
    * first K, re-number. The per-group candidate explode carries only
    * ids and one double, and each candidate group contributes at most
    * K+1 member ids (members are sorted, so no later member of a group
    * can reach the global top-(K+1)).
    */
  private[graft] def s6AnnRerankImpl(e: DataFrame, collapse: Boolean): DataFrame = {
    if (collapse) {
      val hub = vecHub(e, "vec_id", "v")
      val top = topCandidates(
        groupPairs(cappedBandsGrouped(hub, "vec_id", "v"), "vec_id", "v"),
        hub, "vec_id", keep = RerankK + 1)
      // when(isNotNull, ..) widens nullability back to the direct
      // path's (d4's expansion precedent: analysis-time schema parity).
      return hub.select(col("vec_id").as("gq"), col("members")).join(top, Seq("gq"))
        .select(explode(col("members")).as("qx"), col("cand"))
        .select(col("qx"),
          slice(filter(col("cand"), x => x.getField("nid") =!= col("qx")),
            1, RerankK).as("ck"))
        .select(col("qx"), posexplode(col("ck")).as(Seq("p", "c")))
        .select(when(col("qx").isNotNull, col("qx")).as("query_id"),
          when(col("c.nid").isNotNull, col("c.nid")).as("neighbor_id"),
          (col("p") + 1).cast("long").as("rank"), col("c.cs").as("cos_sim"))
    }
    val c = cappedBands(e, "vec_id", "v")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    c.as("a")
      .join(c.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"),
        round(cosine(col("a.v"), col("b.v")), 6).as("cos_sim"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= RerankK)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"), col("cos_sim"))
  }

  private val NCentroids = 8
  private val IvfQueries = 5 // vec_id in [NCentroids, NCentroids+IvfQueries)
  private val IvfTopK = 3

  private val IvfNProbe = 2

  /** s3 — IVF-style ANN: a fixed centroid set partitions the corpus into
    * cells (assignment = argmax cosine to centroid, deterministic
    * tie-break); each query probes its `IvfNProbe` nearest cells. This is
    * the inverted-file scale path: the corpus shuffles once by cell id, a
    * query touches ~nprobe/k of the corpus, and nprobe is the
    * recall-vs-cost knob. Cells are disjoint, so probing several needs no
    * dedup. Centroids here are the first `NCentroids` vectors (a real
    * deployment feeds k-means centroids in — the operator is identical).
    */
  def s3IvfAnn(s: SparkSession, dir: String): DataFrame = {
    // spread: the corpus×centroid scoring is per-row compute above the
    // scan; row_number is comparison-based (order-insensitive), so the
    // round-robin is hash-safe. The centroid collect is k rows — the
    // same bounded driver hop Kmeans.initFrom already makes.
    val e = graft.Tables.spread(load(s, dir, "embeddings"))
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val centroids = e.filter(col("vec_id") < NCentroids)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
      .sortBy(_._1).toSeq
    s3IvfAnnWith(e, centroids)
  }

  /** s3b — s3 with k-means-trained cells ([[Kmeans.trainCentroids]],
    * scaled longs mapped back to float space) — the self-contained IVF
    * story, oracle-gated end to end: the oracle splices s7's Lloyd's
    * CTE replay in front of s3's IVF SQL, so training AND search
    * hash-match in one statement. The operator is s3's exact shape
    * (plan properties pinned there); only the centroid source differs.
    */
  def s3IvfAnnTrained(s: SparkSession, dir: String): DataFrame = {
    val e = graft.Tables.spread(load(s, dir, "embeddings"))
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val trained = Kmeans.trainCentroids(s, dir)
      .map { case (cell, cv) => (cell, cv.map(_.toDouble / Kmeans.Scale)) }
    s3IvfAnnWith(e, trained)
  }

  /** The IVF operator proper, centroid source pluggable: assignment leg
    * scores the full corpus once (max_by partial+final), probe leg's
    * vec_id range pushes to the scan — see [[s3IvfAnn]]'s plan notes.
    */
  private def s3IvfAnnWith(e: DataFrame, cents: Seq[(Long, Seq[Double])]): DataFrame = {
    // Two scored legs, and that is the scale-correct shape (round-3 scan
    // audit verified, then falsified, a recompute here): the assignment
    // leg scores the FULL corpus exactly once — ROW-LOCALLY, centroids
    // being k driver literals: `greatest()` over k struct(cc, -cent_id)
    // columns is the argmax with the same (cc desc, cent_id asc)
    // tie-break the old max_by keyed, and the corpus never shuffles for
    // assignment (the previous crossJoin + max_by-by-id form pushed
    // every vector through an exchange as agg payload). The probes leg's
    // vec_id range pushes into the scan, so it scores only the handful
    // of query vectors; nprobe > 1 keeps it on the window form.
    val cands = cents.map { case (cid, cv) =>
      struct(cosine(col("v"), array(cv.map(lit): _*)).as("cc"),
        lit(-cid).as("n"), lit(cid).as("cell"))
    }
    // Degenerate corpora: no centroids → typed null → zero assignments
    // (the old join form's semantics); one centroid → no greatest().
    val best =
      if (cands.isEmpty) lit(null).cast("struct<cc:double,n:bigint,cell:bigint>")
      else if (cands.sizeIs == 1) cands.head
      else greatest(cands: _*)
    val assigned = e.select(col("vec_id"), col("v"),
      best.getField("cell").as("cell"))
      .filter(col("cell").isNotNull)
    val s = e.sparkSession
    import s.implicits._
    val centDf = broadcast(cents.toDF("cent_id", "cv"))
    val pw = Window.partitionBy("vec_id")
      .orderBy(col("cc").desc, col("cent_id").asc)
    val probes = e
      .filter(col("vec_id") >= NCentroids && col("vec_id") < NCentroids + IvfQueries)
      .crossJoin(centDf)
      .select(col("vec_id"), col("v"), col("cent_id"),
        cosine(col("v"), col("cv")).as("cc"))
      .withColumn("probe_rank", row_number().over(pw))
      .filter(col("probe_rank") <= IvfNProbe)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("cent_id").as("qcell"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    assigned.join(broadcast(probes),
      col("cell") === col("qcell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("qcell").as("cell"),
        round(cosine(col("qv"), col("v")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= IvfTopK)
      .select(col("query_id"), col("neighbor_id"), col("cell"),
        col("rank").cast("long").as("rank"), col("cos_sim"))
  }

  private[ops] val PqSubspaces = 4
  private[ops] val PqSubDim = 16 // 64-dim embeddings / 4 subspaces
  private val PqCodes = 8

  /** s4 — product-quantization code assignment: split each vector into
    * `PqSubspaces` subvectors and store, per subspace, the id of the
    * nearest codebook centroid (squared-L2 argmin, tie-break smallest
    * id). 64 dims × 4 bytes become 4 one-byte codes — the compression
    * that makes billion-vector ANN fit in memory; at query time distances
    * are approximated from tiny per-subspace lookup tables. Codebooks
    * here are the first `PqCodes` vectors' subvectors (k-means feeds real
    * ones in; the assignment operator — the scale-critical part — is
    * identical). Integer code output is robust to float-association ulps,
    * so the oracle needs no bit-level care beyond determinism of argmin.
    */
  /** (vec_id, sub_idx, sv): every vector split into its PQ subvectors —
    * the one place the subspace layout is defined.
    */
  private[graft] def subvectors(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .select(col("vec_id"),
        posexplode(array((0 until PqSubspaces).map(b =>
          slice(col("v"), b * PqSubDim + 1, PqSubDim)): _*)).as(Seq("sub_idx", "sv")))

  /** Codebook = the first `PqCodes` vectors' subvectors, collected —
    * `PqCodes × PqSubspaces` rows, the bounded driver hop every literal
    * codebook makes ([[Kmeans]]'s initFrom precedent). Sorted for a
    * deterministic expression layout.
    */
  private def codebook(subs: DataFrame): Seq[(Long, Int, Seq[Double])] =
    subs.filter(col("vec_id") < PqCodes)
      .select(col("vec_id"), col("sub_idx"), col("sv"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2)))
      .sortBy(t => (t._2, t._1)).toSeq

  def s4PqCodes(s: SparkSession, dir: String): DataFrame = {
    val subs = subvectors(s, dir)
    s4PqCodesWith(subs, codebook(subs))
  }

  /** The PQ assignment operator proper, codebook pluggable —
    * `(cent_id, c_sub, cv)` driver-side rows. The oracled [[s4PqCodes]]
    * feeds the first-`PqCodes` seed codebook; [[s4PqCodesTrained]] feeds
    * per-subspace k-means centroids through the same shape. The argmin
    * is row-local — one filtered branch per subspace id, each branch
    * `least()` over that subspace's k struct(dist, cent_id) columns,
    * unioned — so the exploded corpus never shuffles and never joins:
    * the old broadcast-join + min_by-by-(vec_id, sub_idx) form pushed
    * every subvector row through an aggregation exchange.
    */
  private[ops] def s4PqCodesWith(subs: DataFrame,
      cents: Seq[(Long, Int, Seq[Double])]): DataFrame = {
    // Native fused-double kernel (SqDistLong's template): the composed
    // aggregate(zip_with(…)) form evaluated every candidate's per-element
    // lambdas outside whole-stage codegen — this is the per-row hot loop
    // (rows × k candidates), and the swap is bit-identical by construction
    // (same sequential fold; FunctionsSpec pins it against the composed
    // spec form, sqDistDoubleComposed).
    def sqd(cv: Seq[Double]): Column =
      graft.functions.SqDistDouble.sq_dist_double(
        col("sv"), array(cv.map(lit): _*))
    val bySub = cents.groupBy(_._2).view
      .mapValues(_.map(c => (c._1, c._3))).toSeq.sortBy(_._1)
    // One filtered branch per subspace, unioned — NOT a nested CASE
    // chain over sub_idx (Kmeans.assignGrouped's round-17 lesson: the
    // chain form ran s8's 100×-gate assignment at ~19 µs/row; each
    // branch here is one independent least()-of-k expression). Rows
    // whose sub_idx has no codebook vanish, like the old inner join;
    // the empty-codebook dummy mirrors the branch form's nullability
    // (nullable dist, non-null code) for degenerate-schema parity.
    val assigned =
      if (bySub.isEmpty)
        subs.filter(lit(false)).select(col("vec_id"), col("sub_idx"),
          struct(lit(null).cast("double").as("dist"), lit(0L).as("code")).as("b"))
      else bySub.map { case (sub, cs) =>
        val cands = cs.map { case (cid, cv) =>
          struct(sqd(cv).as("dist"), lit(cid).as("code"))
        }
        subs.filter(col("sub_idx") === sub)
          .select(col("vec_id"), col("sub_idx"),
            (if (cands.sizeIs == 1) cands.head else least(cands: _*)).as("b"))
      }.reduce(_ unionByName _)
    assigned.filter(col("b").isNotNull)
      .select(col("vec_id"), col("sub_idx").cast("long").as("sub_idx"),
        col("b.code").as("code"))
  }

  /** s4 with per-subspace k-means-trained codebooks
    * ([[Kmeans.trainPqCodebooks]]) — real PQ training instead of the
    * seed codebook, through the unchanged assignment operator. Spec-
    * gated (KmeansSpec asserts strictly lower quantization error than
    * the seed codebook); the oracled s4 pins the operator itself.
    */
  def s4PqCodesTrained(s: SparkSession, dir: String): DataFrame = {
    val trained = Kmeans.trainPqCodebooks(s, dir)
      .map { case (b, cell, cv) =>
        (cell, b, cv.map(_.toDouble / Kmeans.Scale)) }
    s4PqCodesWith(subvectors(s, dir), trained)
  }

  private val PqTopK = 3
  private val PqQueries = 3 // query vec_ids: [PqCodes, PqCodes + PqQueries)

  /** s5 — PQ asymmetric-distance search (ADC): queries stay exact, the
    * corpus is its PQ codes. Per query, a (subspace × centroid) distance
    * table — `PqSubspaces × PqCodes` doubles — is broadcast; a corpus
    * vector's approximate distance is the sum of four table lookups via
    * an equi-join on (sub_idx, code). This is why PQ scales: the corpus
    * side touches only 1-byte codes, the float math is queries ×
    * codebook, not queries × corpus. Top-k per query by (distance asc,
    * vec_id asc).
    */
  def s5PqSearch(s: SparkSession, dir: String): DataFrame = {
    // Build the subvector pipeline ONCE and feed codes/queries/codebook
    // from it through the pluggable-codebook seam (review-caught:
    // calling s4PqCodes here constructed a second, divergent subvectors
    // subtree that ReuseExchange could never collapse).
    val subs = subvectors(s, dir)
    val cb = codebook(subs)
    val codes = s4PqCodesWith(subs, cb) // (vec_id, sub_idx, code)
    val queries = subs
      .filter(col("vec_id") >= PqCodes && col("vec_id") < PqCodes + PqQueries)
      .select(col("vec_id").as("query_id"), col("sub_idx").as("q_sub"), col("sv").as("qv"))
    val sqDist =
      graft.functions.SqDistDouble.sq_dist_double(col("qv"), col("cv"))
    // Distance tables: queries × subspaces × centroids (tiny — broadcast;
    // the codebook side is the collected literal rows, not a subtree).
    import s.implicits._
    val cents = cb.toDF("cent_id", "c_sub", "cv")
    val tables = queries.join(broadcast(cents), col("q_sub") === col("c_sub"))
      .select(col("query_id"), col("q_sub").as("sub_idx"),
        col("cent_id").as("code"), sqDist.as("d"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("approx_dist").asc, col("vec_id").asc)
    // One addend per subspace, added in fixed subspace order — a plain
    // sum() would associate in partial-agg arrival order, which is not
    // reproducible across runs (double addition isn't associative).
    val perSub = (0 until PqSubspaces).map(i =>
      max(when(col("sub_idx") === i, col("d"))).as(s"d_$i"))
    codes.join(broadcast(tables), Seq("sub_idx", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(perSub.head, perSub.tail: _*)
      .withColumn("approx_dist",
        round((0 until PqSubspaces).map(i => col(s"d_$i")).reduce(_ + _), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= PqTopK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), col("approx_dist"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_knn_cosine" -> s1KnnCosine,
    "s2_ann_lsh" -> s2AnnLsh,
    "s2b_ann_multiband" -> s2bAnnMultiband,
    "s6_ann_rerank" -> s6AnnRerank,
    "s3_ivf_ann" -> s3IvfAnn,
    "s3b_ivf_trained" -> s3IvfAnnTrained,
    "s4_pq_codes" -> s4PqCodes,
    "s5_pq_search" -> s5PqSearch)

  private[ops] def bucketSql(v: String): String =
    (1 to NBuckBits).map(i =>
      s"CASE WHEN $v[$i] > 0 THEN CAST(${1L << (i - 1)} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
      .mkString(" + ")

  /** Banded + capped CTEs over `embeddings`, shared by the s2b/d8b
    * oracles. Deliberately an independent formulation: GROUP BY … HAVING
    * population cap instead of Spark's window count — same capped-bucket
    * semantics, different machinery on each engine.
    */
  private[ops] def bandedCteSql: String = {
    def tblBucketSql(b: Int): String =
      (1 to BandBits).map(i =>
        s"CASE WHEN embedding[${b * BandBits + i}] > 0 THEN CAST(${1L << (i - 1)} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
        .mkString(" + ")
    val caseSql = (0 until BandTables)
      .map(b => s"WHEN $b THEN ${tblBucketSql(b)}").mkString(" ")
    s"""banded AS (SELECT vec_id, embedding, g.tbl,
       |    CASE g.tbl $caseSql END AS bucket
       |  FROM embeddings, generate_series(0, ${BandTables - 1}) g(tbl)),
       |capped AS (SELECT tbl, bucket FROM banded GROUP BY 1, 2
       |           HAVING count(*) BETWEEN 2 AND $MaxBucket)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "s1_knn_cosine" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |           FROM embeddings WHERE vec_id < $NQueries),
         |sims AS (SELECT q.query_id, e.vec_id,
         |    round(${cosineSql("q.qv", "e.embedding")}, 6) AS cos_sim
         |  FROM embeddings e JOIN q ON e.vec_id <> q.query_id),
         |ranked AS (SELECT query_id, vec_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, vec_id ASC) AS rank
         |  FROM sims)
         |SELECT query_id, vec_id AS neighbor_id, CAST(rank AS BIGINT) AS rank, cos_sim
         |FROM ranked WHERE rank <= $TopK""".stripMargin,
    "s2b_ann_multiband" ->
      s"""WITH $bandedCteSql,
         |cand AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    round(${cosineSql("a.embedding", "b.embedding")}, 6) AS cos_sim
         |  FROM banded a
         |  JOIN banded b ON a.tbl = b.tbl AND a.bucket = b.bucket
         |    AND a.vec_id <> b.vec_id
         |  JOIN capped c ON c.tbl = a.tbl AND c.bucket = a.bucket),
         |ranked AS (SELECT query_id, neighbor_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
         |  FROM cand)
         |SELECT query_id, neighbor_id, cos_sim FROM ranked WHERE rn = 1""".stripMargin,
    "s6_ann_rerank" ->
      s"""WITH $bandedCteSql,
         |cand AS (SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |    round(${cosineSql("a.embedding", "b.embedding")}, 6) AS cos_sim
         |  FROM banded a
         |  JOIN banded b ON a.tbl = b.tbl AND a.bucket = b.bucket
         |    AND a.vec_id <> b.vec_id
         |  JOIN capped c ON c.tbl = a.tbl AND c.bucket = a.bucket),
         |ranked AS (SELECT query_id, neighbor_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
         |  FROM cand)
         |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank, cos_sim
         |FROM ranked WHERE rn <= $RerankK""".stripMargin,
    "s2_ann_lsh" ->
      // Independent cap formulation, as in the banded CTE: GROUP BY …
      // HAVING population bounds instead of Spark's window count.
      s"""WITH e AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
         |           FROM embeddings),
         |capped AS (SELECT bucket FROM e GROUP BY 1
         |           HAVING count(*) BETWEEN 2 AND $MaxBucket),
         |sims AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, a.bucket,
         |    round(${cosineSql("a.embedding", "b.embedding")}, 6) AS cos_sim,
         |    row_number() OVER (PARTITION BY a.vec_id
         |      ORDER BY round(${cosineSql("a.embedding", "b.embedding")}, 6) DESC,
         |               b.vec_id ASC) AS rn
         |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
         |  JOIN capped c ON c.bucket = a.bucket)
         |SELECT query_id, neighbor_id, bucket, cos_sim FROM sims WHERE rn = 1""".stripMargin,
    "s3_ivf_ann" ->
      s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cv
         |              FROM embeddings WHERE vec_id < $NCentroids),
         |scored AS (SELECT e.vec_id, e.embedding, c.cent_id,
         |    ${cosineSql("e.embedding", "c.cv")} AS cc,
         |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |      ${cosineSql("e.embedding", "c.cv")} DESC, c.cent_id ASC) AS rn
         |  FROM embeddings e CROSS JOIN cent c),
         |assigned AS (SELECT vec_id, embedding, cent_id AS cell
         |             FROM scored WHERE rn = 1),
         |probes AS (SELECT vec_id AS query_id, embedding AS qv, cent_id AS qcell
         |           FROM scored
         |           WHERE vec_id >= $NCentroids AND vec_id < ${NCentroids + IvfQueries}
         |             AND rn <= $IvfNProbe),
         |sims AS (
         |  SELECT q.query_id, a.vec_id AS neighbor_id, q.qcell AS cell,
         |    round(${cosineSql("q.qv", "a.embedding")}, 6) AS cos_sim,
         |    row_number() OVER (PARTITION BY q.query_id ORDER BY
         |      round(${cosineSql("q.qv", "a.embedding")}, 6) DESC, a.vec_id ASC) AS rank
         |  FROM assigned a JOIN probes q ON a.cell = q.qcell AND a.vec_id <> q.query_id)
         |SELECT query_id, neighbor_id, cell, CAST(rank AS BIGINT) AS rank, cos_sim
         |FROM sims WHERE rank <= $IvfTopK""".stripMargin,
    "s3b_ivf_trained" ->
      // s7's Lloyd's training replay (identical quantization and
      // arithmetic) spliced in front of s3's IVF search: cent = trained
      // centroids mapped back to double space exactly as the engine does
      // (long → double is exact below 2^53; division by the power-of-ten
      // scale is one IEEE op on both engines).
      s"""WITH ${graft.ops.Kmeans.kmeansCtesSql(graft.ops.Kmeans.corpusQCte,
            graft.ops.Kmeans.Dim, sub = false)},
         |cent AS (SELECT cell AS cent_id,
         |           list_transform(cv, x -> CAST(x AS DOUBLE)
         |             / CAST(${graft.ops.Kmeans.Scale} AS DOUBLE)) AS cv
         |         FROM c${graft.ops.Kmeans.Iters}),
         |scored AS (SELECT e.vec_id, e.embedding, c.cent_id,
         |    ${cosineSql("e.embedding", "c.cv")} AS cc,
         |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |      ${cosineSql("e.embedding", "c.cv")} DESC, c.cent_id ASC) AS rn
         |  FROM embeddings e CROSS JOIN cent c),
         |assigned AS (SELECT vec_id, embedding, cent_id AS cell
         |             FROM scored WHERE rn = 1),
         |probes AS (SELECT vec_id AS query_id, embedding AS qv, cent_id AS qcell
         |           FROM scored
         |           WHERE vec_id >= $NCentroids AND vec_id < ${NCentroids + IvfQueries}
         |             AND rn <= $IvfNProbe),
         |sims AS (
         |  SELECT q.query_id, a.vec_id AS neighbor_id, q.qcell AS cell,
         |    round(${cosineSql("q.qv", "a.embedding")}, 6) AS cos_sim,
         |    row_number() OVER (PARTITION BY q.query_id ORDER BY
         |      round(${cosineSql("q.qv", "a.embedding")}, 6) DESC, a.vec_id ASC) AS rank
         |  FROM assigned a JOIN probes q ON a.cell = q.qcell AND a.vec_id <> q.query_id)
         |SELECT query_id, neighbor_id, cell, CAST(rank AS BIGINT) AS rank, cos_sim
         |FROM sims WHERE rank <= $IvfTopK""".stripMargin,
    "s4_pq_codes" ->
      s"""WITH sub AS (SELECT i AS sub_idx FROM generate_series(0, ${PqSubspaces - 1}) g(i)),
         |vecs AS (SELECT e.vec_id, s.sub_idx,
         |    e.embedding[s.sub_idx * $PqSubDim + 1 : s.sub_idx * $PqSubDim + $PqSubDim] AS sv
         |  FROM embeddings e, sub s),
         |cents AS (SELECT vec_id AS cent_id, sub_idx AS c_sub, sv AS cv
         |  FROM vecs WHERE vec_id < $PqCodes),
         |d AS (SELECT v.vec_id, v.sub_idx, c.cent_id,
         |    list_sum(list_transform(generate_series(1, $PqSubDim),
         |      i -> (CAST(v.sv[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) ^ 2)) AS dist,
         |    row_number() OVER (PARTITION BY v.vec_id, v.sub_idx
         |      ORDER BY list_sum(list_transform(generate_series(1, $PqSubDim),
         |        i -> (CAST(v.sv[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) ^ 2)) ASC,
         |      c.cent_id ASC) AS rn
         |  FROM vecs v JOIN cents c ON v.sub_idx = c.c_sub)
         |SELECT vec_id, CAST(sub_idx AS BIGINT) AS sub_idx, cent_id AS code
         |FROM d WHERE rn = 1""".stripMargin,
    "s5_pq_search" -> {
      val distSql =
        s"list_sum(list_transform(generate_series(1, $PqSubDim), " +
          "i -> (CAST(q.qv[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) ^ 2))"
      val codeAssignSql =
        s"""SELECT vec_id, sub_idx, cent_id AS code
           |  FROM (SELECT v.vec_id, v.sub_idx, c.cent_id,
           |          row_number() OVER (PARTITION BY v.vec_id, v.sub_idx
           |            ORDER BY list_sum(list_transform(generate_series(1, $PqSubDim),
           |              i -> (CAST(v.sv[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE)) ^ 2)) ASC,
           |            c.cent_id ASC) AS rn
           |        FROM vecs v JOIN cents c ON v.sub_idx = c.c_sub) t
           |  WHERE rn = 1""".stripMargin
      val addends = (0 until PqSubspaces)
        .map(i => s"max(CASE WHEN t.sub_idx = $i THEN t.d END)")
        .mkString("(", " + ", ")")
      s"""WITH sub AS (SELECT i AS sub_idx FROM generate_series(0, ${PqSubspaces - 1}) g(i)),
         |vecs AS (SELECT e.vec_id, s.sub_idx,
         |    e.embedding[s.sub_idx * $PqSubDim + 1 : s.sub_idx * $PqSubDim + $PqSubDim] AS sv
         |  FROM embeddings e, sub s),
         |cents AS (SELECT vec_id AS cent_id, sub_idx AS c_sub, sv AS cv
         |  FROM vecs WHERE vec_id < $PqCodes),
         |codes AS ($codeAssignSql),
         |q AS (SELECT vec_id AS query_id, sub_idx AS q_sub, sv AS qv FROM vecs
         |      WHERE vec_id >= $PqCodes AND vec_id < ${PqCodes + PqQueries}),
         |tables AS (SELECT q.query_id, q.q_sub AS sub_idx, c.cent_id AS code,
         |    $distSql AS d
         |  FROM q JOIN cents c ON q.q_sub = c.c_sub),
         |dists AS (SELECT t.query_id, cd.vec_id,
         |    round($addends, 6) AS approx_dist
         |  FROM codes cd JOIN tables t
         |    ON cd.sub_idx = t.sub_idx AND cd.code = t.code
         |  WHERE cd.vec_id <> t.query_id
         |  GROUP BY t.query_id, cd.vec_id),
         |ranked AS (SELECT query_id, vec_id, approx_dist,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY approx_dist ASC, vec_id ASC) AS rank
         |  FROM dists)
         |SELECT query_id, vec_id AS neighbor_id, CAST(rank AS BIGINT) AS rank, approx_dist
         |FROM ranked WHERE rank <= $PqTopK""".stripMargin
    })
}

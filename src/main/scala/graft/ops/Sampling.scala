package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Deterministic content-hash sampling and split assignment for corpus
  * curation (the reference's dataset has no sampling; these are the
  * north-star training-pipeline operators).
  *
  * Both operators key on `md5(doc_id ':' text)` — a pure function of the
  * row, so the sample/split is (a) reproducible across runs, engines and
  * cluster sizes, (b) stable under repartitioning and insertion order
  * (unlike `rand()` or `TABLESAMPLE`), and (c) a narrow per-row predicate:
  * it composes with a 100 TB scan at parquet-read speed with no shuffle
  * and no driver-side state. Rate granularity here is 1/16 per hex digit;
  * widen the prefix for finer rates.
  */
object Sampling {

  // The ONE content-key formulation: md5 over the ':'-joined columns.
  // concat (null-propagating, like the oracle's `||`) — NOT concat_ws,
  // which silently skips null arguments and would hash a null-text row
  // from doc_id alone while the oracle drops it: a cross-engine
  // divergence in an operator whose whole contract is determinism.
  // A null key hashes to null → excluded from the sample (q38/q58),
  // CASE-falls-through to the last split (q39), and pre-filtered out
  // in q59. Every sampling operator derives its key from THIS helper
  // so the format can only change everywhere at once (in lockstep
  // with the `md5(CAST(doc_id AS VARCHAR) || ':' || text)` oracle
  // strings).
  private def contentMd5(c: Column*): Column =
    md5(concat(c.flatMap(x => Seq(x, lit(":"))).dropRight(1): _*))

  private[ops] def hexKey(c: Column*): Column =
    substring(contentMd5(c: _*), 1, 1)

  /** The q39 split rule as a column — the ONE formulation of the
    * train/val/test assignment (12/2/2 of 16), shared with
    * [[Curation]]: changing the thresholds or hash here changes every
    * consumer together, in lockstep with q39's oracle.
    */
  private[graft] def splitLabel(id: Column, text: Column): Column = {
    val h = hexKey(id.cast("string"), text)
    when(h < "c", "train").when(h < "e", "val").otherwise("test")
  }

  private val SampleDigits = Seq("0", "1", "2") // 3/16 ≈ 18.75%

  /** q38 — deterministic hash sample of `documents` (~19%): rows whose
    * content-hash first hex digit falls in a fixed set.
    */
  def q38HashSample(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .filter(hexKey(col("doc_id").cast("string"), col("text"))
        .isin(SampleDigits.map(x => x: Any): _*))
      .select(col("doc_id"), col("source"), col("lang"))

  /** q39 — train/val/test split assignment by hash bucket (12/2/2 of 16),
    * reported as per-(source, split) counts — the stratification audit a
    * pipeline runs before training.
    */
  def q39SplitAssign(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .select(col("source"),
        splitLabel(col("doc_id"), col("text")).as("split"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"))

  /** q55 — deterministic weighted pick: one winner per source stratum,
    * chosen with probability ~proportional to an integer quality weight
    * (here `1 + n_chars div 100`, capped) — the mixture-sampling shape a
    * training pipeline uses to over-represent higher-quality documents
    * while staying reproducible.
    *
    * Mechanism: each document gets `w` tickets, each ticket hashes to
    * md5(doc_id ':' ticket), and the stratum winner is the minimum hash
    * (ties broken by doc_id — unreachable for md5 but stated). More
    * tickets → proportionally more chances to hold the minimum. Like
    * q38/q39 this is a pure function of the data: stable across runs,
    * engines, partitionings and cluster sizes, unlike rand()-weighted
    * reservoirs.
    *
    * Scale: the ticket explode is bounded by the weight cap (≤8×), the
    * min(struct) aggregate is map-side partial (each task forwards ONE
    * candidate per stratum), so the shuffle carries #partitions×#strata
    * tiny rows regardless of corpus size. `div` vs `//`: n_chars ≥ 0 so
    * truncating and flooring division agree (the q40 negative-operand
    * caveat doesn't apply).
    */
  def q55WeightedPick(s: SparkSession, dir: String): DataFrame =
    weightedPick(load(s, dir, "documents"), "source", "doc_id",
      least(lit(8L), lit(1L) + expr("n_chars div 100")))

  /** Core of q55: min-ticket-hash winner per stratum. `weight` is an
    * integral Column (≤ some small cap — it multiplies rows); rows with
    * weight < 1 get NO tickets and can never win. The explicit filter
    * matters: `sequence(1, w)` defaults its step to -1 when w < 1 and
    * would hand a "weightless" row phantom DESCENDING tickets [1, 0, …]
    * — diverging from the oracle's empty `range(1, w+1)`.
    */
  def weightedPick(df: DataFrame, stratum: String, id: String,
      weight: Column): DataFrame =
    df.filter(weight >= 1)
      .select(col(stratum), col(id), explode(sequence(lit(1L), weight)).as("t"))
      .withColumn("h",
        md5(concat(col(id).cast("string"), lit(":"), col("t").cast("string"))))
      .groupBy(stratum)
      .agg(min(struct(col("h"), col(id))).as("m"))
      .select(col(stratum), col(s"m.$id").as("picked"))

  /** Target language mixture for q58 — proportions a training run wants
    * the corpus rebalanced to. Written ONCE here and interpolated into
    * the oracle SQL, so engine and oracle can never disagree on a
    * weight. Languages not listed get weight 0 (excluded).
    */
  private[ops] val LangWeights: Seq[(String, Double)] =
    Seq("en" -> 0.4, "zh" -> 0.2, "es" -> 0.2, "de" -> 0.1, "fr" -> 0.1)

  /** md5-uniform in [0, 1): first 8 hex digits of the content hash as a
    * 32-bit integer over 2^32. Same key as q38/q39 (doc_id ':' text), so
    * a document's sampling fate is one pure function of its content; a
    * null text hashes to null and the `<` comparison drops the row in
    * both engines (the q38 null contract).
    */
  private def mdUniform(id: Column, text: Column): Column =
    conv(substring(contentMd5(id.cast("string"), text), 1, 8),
      16, 10).cast("long") / lit(4294967296.0)

  /** q58 — mixture sampling: downsample per-language so the kept corpus
    * matches a target language mix ([[LangWeights]]), keeping as many
    * documents as the mix allows. The largest feasible total is
    * T = min_l(n_l / w_l) (the binding language keeps everything); each
    * language then keeps fraction f_l = (T * w_l) / n_l via the q38-style
    * deterministic hash threshold — reproducible across runs, engines,
    * partitionings, and cluster sizes.
    *
    * Scale shape: pass 1 is a language histogram (partial-agg'd,
    * dimension-bounded rows on the wire); the fractions are a broadcast
    * of #languages rows; pass 2 is a scan-speed per-row predicate. Two
    * corpus scans by design — the alternative single-pass shape (a
    * count() window over every row keyed by language) shuffles the
    * ENTIRE corpus to compute 5 numbers. Float discipline: f_l is
    * computed as `(T * w) / n` — one multiply then one divide, written
    * identically in the oracle, so IEEE doubles agree bit-for-bit; the
    * OUTPUT carries no floats at all.
    */
  def q58MixtureSample(s: SparkSession, dir: String): DataFrame =
    mixtureSample(load(s, dir, "documents"), LangWeights)
      .select(col("doc_id"), col("lang"), col("source"))

  /** Frame-based core of q58 over any (doc_id, text, `key`, …) frame —
    * returns the kept rows unchanged. Keys not in `weights` (or with
    * weight 0, which would make n/w infinite and can never bind) are
    * excluded by the inner join.
    */
  def mixtureSample(docs: DataFrame, weights: Seq[(String, Double)],
      key: String = "lang"): DataFrame = {
    // A duplicated key would double-join its documents (one output row
    // per distinct fraction passed) — config lists are caller-merged,
    // so fail loudly instead of silently multiplying rows.
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate keys in weights: ${weights.map(_._1).diff(weights.map(_._1).distinct).distinct.mkString(", ")}")
    val s = docs.sparkSession
    import s.implicits._
    val w = weights.filter(_._2 > 0).toDF(key, "w")
    val counts = docs.groupBy(key).agg(count(lit(1)).as("n"))
    val weighted = counts.join(broadcast(w), key)
    val t = weighted.agg(min(col("n") / col("w")).as("t"))
    val frac = weighted.crossJoin(broadcast(t))
      .select(col(key), (col("t") * col("w") / col("n")).as("f"))
    keepByFraction(docs, frac, key)
  }

  // The shared tail of q58/q60: per-key keep fractions broadcast onto a
  // scan-speed hash-threshold predicate. `frac` is (key, f) with f the
  // EXACT double both engines computed identically.
  private def keepByFraction(docs: DataFrame, frac: DataFrame,
      key: String): DataFrame =
    docs.join(broadcast(frac), key)
      .filter(mdUniform(col("doc_id"), col("text")) < col("f"))
      .drop("f")

  /** q60 — temperature-rebalanced sampling (the multilingual-pretraining
    * α-sampling of mBERT/XLM-R): per-language weights w_l = n_l^α boost
    * low-resource languages relative to their corpus share. α = 0.5 here
    * — written as `sqrt`, which IEEE 754 REQUIRES to be correctly
    * rounded, so engine and oracle agree bit-for-bit (a general `pow`
    * is only ~1-ulp accurate and differs between java.lang.Math and
    * libm; an ulp in the threshold could flip a document near the
    * boundary). Normalizing the weights is deliberately skipped:
    * T = min(n/w) makes the kept fractions f = T·w/n invariant under
    * any constant scaling of w, and dropping the Σ√n normalizer also
    * drops the only float SUM — whose partial-agg association order
    * would not be cross-engine-reproducible.
    *
    * Scale shape = q58's: a dimension-bounded histogram pass, a
    * broadcast of #languages fractions, then a scan-speed per-row
    * predicate; no corpus-wide shuffle.
    */
  def q60TemperatureMix(s: SparkSession, dir: String): DataFrame =
    temperatureMix(load(s, dir, "documents"))
      .select(col("doc_id"), col("lang"), col("source"))

  /** Frame-based core of q60 over any (doc_id, text, `key`, …) frame —
    * returns the kept rows unchanged. Every key present in `docs`
    * participates (weights derive from the data, not a config list).
    */
  def temperatureMix(docs: DataFrame, key: String = "lang"): DataFrame = {
    val weighted = docs.groupBy(key).agg(count(lit(1)).as("n"))
      .select(col(key), col("n"), sqrt(col("n")).as("w"))
    val t = weighted.agg(min(col("n") / col("w")).as("t"))
    val frac = weighted.crossJoin(broadcast(t))
      .select(col(key), (col("t") * col("w") / col("n")).as("f"))
    keepByFraction(docs, frac, key)
  }

  private val TokenBudget = 800L

  /** q59 — token-budget cap: keep each source's documents in
    * deterministic hash order until a per-source token budget fills
    * (the "cap every domain at N tokens" step of corpus assembly —
    * q58 balances BY PROPORTION, this caps BY ABSOLUTE budget). The
    * hash order is the same md5 content key as q38/q58, so "which
    * documents make the cut" is a pure function of the data — a
    * reproducible random-looking prefix, not insertion order. A
    * document straddling the boundary is dropped (budget is a
    * ceiling, not a target); empty/null-text documents are excluded
    * up front — they could never spend budget, and their null hash
    * would order differently across engines (Spark sorts nulls
    * first, DuckDB last).
    *
    * Scale shape: one shuffle by source + a source-local sort — the
    * window never sees more than one source's rows, so parallelism
    * is the source cardinality (domains, in practice thousands) and
    * the running sum is partition-local. Output is all-integer.
    */
  def q59TokenBudget(s: SparkSession, dir: String): DataFrame =
    tokenBudget(load(s, dir, "documents"), TokenBudget)

  /** Frame-based core of q59 over any (doc_id, text, `key`, …) frame. */
  def tokenBudget(docs: DataFrame, budget: Long,
      key: String = "source"): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), col(key),
        size(TextAnalysis.toks(col("text"))).cast("long").as("n_tokens"),
        contentMd5(col("doc_id").cast("string"), col("text")).as("h"))
      .filter(col("n_tokens") >= 1)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col(key), col("n_tokens"), col("cum_tokens"))
  }

  /** The epoch salt for q61 — a different literal reshuffles the whole
    * corpus deterministically (epoch 2 = a brand-new permutation).
    */
  private val Epoch = "1"

  /** q61 — deterministic epoch shuffle: the global reorder a training
    * run applies before writing shards. A true global permutation rank
    * is a single-task sort at any scale (the rejected global-window
    * shape); what shard writers actually do — and what scales — is
    * two-level: shard = first hex digit of a salted content hash, rank
    * = row_number within the shard ordered by the full hash. Every
    * shard is an independent window task, reading shards in
    * (shard, shard_rank) order IS the permutation, and the epoch salt
    * makes it reproducible run-to-run (epoch in the hash ⇒ epochs are
    * independent permutations). 16 shards here; at 100 TB take 4 hex
    * digits (65,536 shards) — the shape is unchanged. Null text (null
    * hash) is excluded, q38's convention.
    */
  def q61EpochShuffle(s: SparkSession, dir: String): DataFrame = {
    val h = contentMd5(lit(Epoch), col("doc_id").cast("string"), col("text"))
    load(s, dir, "documents")
      .select(col("doc_id"), h.as("h"))
      .filter(col("h").isNotNull)
      .withColumn("shard", conv(substring(col("h"), 1, 1), 16, 10).cast("long"))
      .withColumn("shard_rank",
        row_number().over(Window.partitionBy(col("shard"))
          .orderBy(col("h"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("shard"), col("shard_rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q61_epoch_shuffle" -> q61EpochShuffle,
    "q38_hash_sample" -> q38HashSample,
    "q39_split_assign" -> q39SplitAssign,
    "q55_weighted_pick" -> q55WeightedPick,
    "q58_mixture_sample" -> q58MixtureSample,
    "q59_token_budget" -> q59TokenBudget,
    "q60_temperature_mix" -> q60TemperatureMix)

  private val hSql = "substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 1)"

  /** Oracle-side mirror of [[splitLabel]] as a scalar SQL expression over
    * columns (doc_id, text) in scope — shared by q39 and the composed
    * curation oracle.
    */
  private[ops] val splitCaseSql: String =
    s"""CASE WHEN $hSql < 'c' THEN 'train'
       |     WHEN $hSql < 'e' THEN 'val'
       |     ELSE 'test' END""".stripMargin

  val oracle: Map[String, String] = Map(
    "q61_epoch_shuffle" ->
      s"""WITH h AS (SELECT doc_id,
         |    md5('$Epoch:' || CAST(doc_id AS VARCHAR) || ':' || text) AS h
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(('0x' || substr(h, 1, 1)) AS BIGINT) AS shard,
         |  CAST(row_number() OVER (PARTITION BY substr(h, 1, 1)
         |    ORDER BY h, doc_id) AS BIGINT) AS shard_rank
         |FROM h WHERE h IS NOT NULL""".stripMargin,
    "q38_hash_sample" ->
      s"""SELECT doc_id, source, lang FROM documents
         |WHERE $hSql IN (${SampleDigits.map(d => s"'$d'").mkString(", ")})""".stripMargin,
    "q39_split_assign" ->
      s"""SELECT source,
         |  ($splitCaseSql) AS split,
         |  count(*) AS n_docs
         |FROM documents GROUP BY 1, 2""".stripMargin,
    // The weights VALUES list is generated from the SAME LangWeights the
    // engine uses; CAST to DOUBLE matters — a bare 0.4 literal is
    // DECIMAL in DuckDB and decimal division would diverge from Spark's
    // IEEE doubles.
    "q58_mixture_sample" ->
      s"""WITH w(lang, w) AS (VALUES
         |  ${LangWeights.map { case (l, x) => s"('$l', CAST($x AS DOUBLE))" }.mkString(",\n  ")}),
         |counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
         |weighted AS (SELECT c.lang, c.n, w.w FROM counts c JOIN w USING (lang)),
         |t AS (SELECT min(n / w) AS t FROM weighted),
         |f AS (SELECT lang, (t.t * w) / n AS f FROM weighted, t)
         |SELECT d.doc_id, d.lang, d.source
         |FROM documents d JOIN f USING (lang)
         |WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || d.text), 1, 8)) AS BIGINT)
         |      / 4294967296.0 < f.f""".stripMargin,
    // Windowed SUM cast back to BIGINT (DuckDB widens to HUGEINT →
    // float64 through pandas, which would hash-diverge).
    "q59_token_budget" ->
      s"""WITH t AS (SELECT doc_id, source,
         |    CAST(len(${TextAnalysis.toksSql}) AS BIGINT) AS n_tokens,
         |    md5(CAST(doc_id AS VARCHAR) || ':' || text) AS h
         |  FROM documents),
         |c AS (SELECT doc_id, source, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_tokens
         |  FROM t WHERE n_tokens >= 1)
         |SELECT doc_id, source, n_tokens, cum_tokens
         |FROM c WHERE cum_tokens <= $TokenBudget""".stripMargin,
    // sqrt(CAST(n AS DOUBLE)): IEEE-exact on both engines; the division
    // and multiply orders mirror the Spark formulation token-for-token.
    "q60_temperature_mix" ->
      s"""WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
         |weighted AS (SELECT lang, n, sqrt(CAST(n AS DOUBLE)) AS w FROM counts),
         |t AS (SELECT min(n / w) AS t FROM weighted),
         |f AS (SELECT lang, (t.t * w) / n AS f FROM weighted, t)
         |SELECT d.doc_id, d.lang, d.source
         |FROM documents d JOIN f USING (lang)
         |WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || d.text), 1, 8)) AS BIGINT)
         |      / 4294967296.0 < f.f""".stripMargin,
    // Independent formulation: lateral ticket unnest + window rank
    // instead of explode + min(struct).
    "q55_weighted_pick" ->
      """SELECT source, doc_id AS picked FROM (
        |  SELECT d.source, d.doc_id,
        |         row_number() OVER (PARTITION BY d.source
        |           ORDER BY md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(t.t AS VARCHAR)),
        |                    d.doc_id) AS rn
        |  FROM documents d,
        |       UNNEST(range(1, CAST(1 + least(8, 1 + d.n_chars // 100) AS BIGINT))) AS t(t)
        |) WHERE rn = 1""".stripMargin)
}

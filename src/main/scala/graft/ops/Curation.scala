package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The full training-corpus curation flow, composed from the engine's
  * already-oracled operators: quality gate → normalized dedup (d6's
  * fingerprint) → MinHash near-dup clustering (d2 pairs + d9 connected
  * components, cluster-min keeper) → benchmark decontamination (t10) →
  * deterministic split assignment (q39's hash rule) → context-window
  * chunking (t8). What a user of this library actually runs end to end;
  * CurationSpec pins the composition on a corpus built so every drop
  * reason fires.
  *
  * Every stage is the same code the per-operator oracle gate checks —
  * this object only wires frames together, adding doc-id anti-joins
  * between stages (hash joins on the key, broadcastable when the
  * dropped set is small, never wider than a doc-id column). The full
  * audit trail comes back beside the output: (doc_id, reason) for every
  * rejected document — curation that can't explain its drops can't be
  * debugged at 100 TB.
  */
object Curation {

  /** Curated output: `chunks` ready for tokenization, `audit` = one row
    * per REJECTED candidate doc with its drop reason.
    */
  final case class Curated(chunks: DataFrame, audit: DataFrame)

  /** Curate `docs` ((doc_id, text, lang, source) at minimum).
    * Documents from `evalSource` define the contamination reference and
    * are never emitted. `minJaccard` is the estimated-Jaccard cut for
    * near-dup clustering; `maxPostings` caps t10's inverted index.
    */
  def curate(docs: DataFrame, evalSource: String, langs: Seq[String],
      minTokens: Int, minJaccard: Double = 0.5,
      maxPostings: Int = 1000): Curated = {
    val base = docs.select(col("doc_id"), col("text"), col("lang"), col("source"))
    val candidates = base.filter(col("source") =!= evalSource)
    val evalDocs = base.filter(col("source") === evalSource)

    // 1. Quality gate (t1's shape, minimal form): real text, wanted
    // language, enough tokens to train on.
    val gated = candidates.filter(col("text").isNotNull &&
      col("lang").isin(langs.map(x => x: Any): _*) &&
      size(TextAnalysis.toks(col("text"))) >= minTokens)

    // 2. Normalized dedup (d6 fingerprint): keeper = min doc_id per
    // fingerprint, via a window on the fingerprint clustering.
    val byFp = gated.withColumn("_fp", Dedup.normFp(col("text")))
      .withColumn("_keeper", min(col("doc_id")).over(Window.partitionBy("_fp")))
    val deduped = byFp.filter(col("doc_id") === col("_keeper")).drop("_fp", "_keeper")

    // 3. Near-dup clusters (d2 → d9): connected components over the
    // banded MinHash pairs; the cluster label IS the min member, so
    // label != id identifies every non-keeper.
    val pairs = Dedup.minhashPairs(deduped.select(col("doc_id"), col("text")))
      .filter(col("est_jaccard") >= minJaccard)
    val nearDupIds = Dedup.connectedComponents(
        pairs.select(col("doc_a"), col("doc_b")), "doc_a", "doc_b")
      .filter(col("id") =!= col("label"))
      .select(col("id").as("doc_id"))
    val unique = deduped.join(nearDupIds, Seq("doc_id"), "left_anti")

    // 4. Decontamination (t10) against the eval docs.
    val contaminatedIds = TextAnalysis.contamination(
        unique.unionByName(evalDocs), evalSource, maxPostings)
      .select(col("doc_id"))
    val clean = unique.join(contaminatedIds, Seq("doc_id"), "left_anti")

    // 5. Deterministic split (q39's rule: content-hash first hex digit).
    val h = substring(md5(concat(col("doc_id").cast("string"), lit(":"), col("text"))), 1, 1)
    val withSplit = clean.withColumn("split",
      when(h < "c", "train").when(h < "e", "val").otherwise("test"))

    // 6. Context-window chunks (t8), split label carried per chunk.
    val chunks = TextAnalysis.chunk(withSplit.select(col("doc_id"), col("text")))
      .join(withSplit.select(col("doc_id"), col("source"), col("split")), "doc_id")

    val audit = Seq(
      candidates.join(gated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), lit("gate").as("reason")),
      byFp.filter(col("doc_id") =!= col("_keeper"))
        .select(col("doc_id"), lit("duplicate").as("reason")),
      nearDupIds.select(col("doc_id"), lit("near_duplicate").as("reason")),
      contaminatedIds.select(col("doc_id"), lit("contaminated").as("reason"))
    ).reduce(_ unionByName _)
    Curated(chunks, audit)
  }
}

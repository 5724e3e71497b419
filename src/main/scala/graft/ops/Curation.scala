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
  * this object wires frames together, adding doc-id anti-joins between
  * stages (hash joins on the key, broadcastable when the dropped set is
  * small, never wider than a doc-id column). The full audit trail comes
  * back beside the output: (doc_id, reason) for every rejected
  * document — curation that can't explain its drops can't be debugged
  * at 100 TB.
  *
  * Execution model, stated honestly: `curate` is EAGER — the near-dup
  * clustering inside (connectedComponents) runs Spark jobs at call time
  * and retains its localCheckpoint blocks for the session (see the
  * retention note on Dedup.connectedComponents). The returned `chunks`
  * and `audit` are then independent lazy plans that share upstream
  * stages; evaluating both recomputes the shared gate/dedup/
  * decontamination work unless the caller persists — acceptable for a
  * run-once batch pipeline, persist `docs` (or the result of a first
  * materialization) when iterating.
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
    // minTokens >= 1: chunk() drops zero-token docs (nothing to emit),
    // and a doc dropped there would appear in neither chunks nor audit —
    // silently violating the conservation contract the spec pins.
    require(minTokens >= 1, s"minTokens must be >= 1, got $minTokens")
    val base = docs.select(col("doc_id"), col("text"), col("lang"), col("source"))
    // Null-SAFE comparison: with =!=, a null source fails BOTH filters
    // (three-valued logic) and the doc would vanish without an audit row.
    val candidates = base.filter(!(col("source") <=> evalSource))
    val evalDocs = base.filter(col("source") <=> evalSource)

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

    // 5. Deterministic split — the exact q39 rule, shared formulation.
    val withSplit = clean.withColumn("split",
      Sampling.splitLabel(col("doc_id"), col("text")))

    // 6. Context-window chunks (t8); source/split ride the generator so
    // no join back to withSplit is needed (a self-join would execute the
    // whole upstream pipeline twice — the sides prune differently and
    // can't share exchanges).
    val chunks = TextAnalysis.chunk(withSplit, Seq("source", "split"))

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

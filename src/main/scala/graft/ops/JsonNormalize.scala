package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** Nested-JSON normalization beyond the fixed-schema S4 scan: infer the
  * schema of a JSON string column from the data, decode it, and flatten
  * nested structs into dotted top-level columns — the
  * `raw event blob → columns` step every ingest pipeline needs when the
  * payload schema isn't known at build time.
  *
  * Scale notes:
  *   - Inference is ONE pass over the strings (`spark.read.json`, which
  *     unions observed schemas across rows — drifting payloads widen the
  *     schema, absent fields read as null). At 100 TB, infer on a sample
  *     (`samplingRatio` here) and decode the full corpus with the sampled
  *     schema — inference cost is the knob, decode stays one codegen'd
  *     `from_json` either way.
  *   - Flattening is pure projection (no shuffle, stays inside
  *     whole-stage codegen). Arrays are NOT auto-exploded: explode
  *     changes cardinality, so it stays a separate caller-chosen step
  *     ([[explodeArray]]).
  *
  * The testdata fixtures carry no nested-JSON column (an oracled query
  * would decode flat payloads and pin nothing — the vacuity trap), so
  * this operator is gated by JsonNormalizeSpec's purpose-built nested
  * fixtures instead of the DuckDB oracle.
  */
object JsonNormalize {

  /** Decode `jsonCol` with a schema inferred from the column itself.
    * `samplingRatio` < 1.0 infers from a sample (the 100 TB default);
    * decode always covers every row.
    */
  def parseInferred(df: DataFrame, jsonCol: String,
      samplingRatio: Double = 1.0): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    // Null payloads are routine (optional event blobs) and must not
    // poison inference: the json reader NPEs on a null input string,
    // while from_json below handles null rows fine — so nulls are
    // excluded from the inference pass only.
    val schema = s.read
      .option("samplingRatio", samplingRatio.toString)
      .json(df.select(col(jsonCol)).filter(col(jsonCol).isNotNull).as[String])
      .schema
    df.withColumn(jsonCol, from_json(col(jsonCol), schema))
  }

  /** Flatten every struct column (recursively) into dotted-to-`_`
    * top-level columns: `payload.meta.lang` → `payload_meta_lang`.
    * Arrays and scalars pass through under their flattened name. Pure
    * projection — one pass of column rewrites, no data movement.
    * Caveat: the `_` separator can collide two DISTINCT paths — a
    * pre-existing column literally named like a flattened path
    * (`payload_a` next to `payload.a`), or sibling nested paths whose
    * names contain underscores (`payload.a_b` and `payload.a.b` both
    * flatten to `payload_a_b`). Spark allows duplicate output names, so
    * the flatten itself succeeds; downstream by-name resolution then
    * fails with AMBIGUOUS_REFERENCE (loud, not silent). Payload schemas
    * that mix underscore and nesting conventions need a collision-free
    * separator chosen by the caller (rename before flattening).
    */
  def flatten(df: DataFrame): DataFrame = {
    def cols(prefix: String, c: Column, t: org.apache.spark.sql.types.DataType): Seq[(String, Column)] =
      t match {
        case st: StructType =>
          st.fields.toIndexedSeq.flatMap(f =>
            cols(s"${prefix}_${f.name}", c.getField(f.name), f.dataType))
        case _ => Seq(prefix -> c)
      }
    val flat = df.schema.fields.toIndexedSeq.flatMap {
      case f if f.dataType.isInstanceOf[StructType] =>
        cols(f.name, col(f.name), f.dataType)
      case f => Seq(f.name -> col(f.name))
    }
    df.select(flat.map { case (n, c) => c.as(n) }: _*)
  }

  /** Explode an array column (outer: empty/null arrays keep their row
    * with a null element), flattening struct elements in place so an
    * array-of-objects becomes plain columns. The cardinality-changing
    * step [[flatten]] deliberately leaves to the caller.
    */
  def explodeArray(df: DataFrame, arrayCol: String): DataFrame = {
    val exploded = df.withColumn(arrayCol, explode_outer(col(arrayCol)))
    df.schema(arrayCol).dataType match {
      case ArrayType(_: StructType, _) => flatten(exploded)
      case _ => exploded
    }
  }

  /** The composed normalizer: infer → decode → flatten. */
  def normalize(df: DataFrame, jsonCol: String,
      samplingRatio: Double = 1.0): DataFrame =
    flatten(parseInferred(df, jsonCol, samplingRatio))
}

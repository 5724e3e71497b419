package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded per-partition in batches.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic stub ([[decodeStub]]) — what is real and
  * tested is the Spark-side shape a 100 TB media pipeline needs:
  *   - payloads ride a `BinaryType` column next to typed metadata;
  *   - decode runs via `mapPartitions` over an iterator (the Scala analog
  *     of a batched pandas-UDF), so a real codec would amortize model /
  *     codec init once per partition and stream batches without
  *     materializing a partition in memory;
  *   - output is a typed Dataset row (schema checked at compile time).
  *
  * The stub derives metadata purely from the md5 of the payload, so the
  * DuckDB oracle reproduces it from hex math — the plumbing is
  * correctness-gated even though the codec is fake.
  */
object Multimodal {

  /** Typed decoded-media row. */
  final case class MediaMeta(
      doc_id: Long, width: Long, height: Long, n_frames: Long,
      payload_bytes: Long)

  /** STUB — stands in for a real image/video decode. Deterministic
    * function of the payload's md5 so tests and the oracle can pin it.
    */
  private[ops] def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(payload)
    def b(i: Int): Long = java.lang.Byte.toUnsignedLong(h(i))
    MediaMeta(
      doc_id = docId,
      width = 64 + 8 * (b(0) % 64),
      height = 64 + 8 * (b(1) % 64),
      n_frames = 1 + (b(2) % 30),
      payload_bytes = payload.length.toLong)
  }

  /** m1 — binary payload column → per-partition batched decode → typed
    * metadata. The payload here is synthesized from `text` (UTF-8 bytes)
    * since testdata carries no real media.
    */
  def m1MultimodalMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val withPayload = load(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    withPayload.mapPartitions { it =>
      // Batched iteration: a real codec would init once here and decode
      // each batch vectorized; grouped() keeps memory bounded per batch.
      it.grouped(64).flatMap(_.map { case (id, payload) => decodeStub(id, payload) })
    }.toDF()
  }

  private val FrameStep = 4

  /** m2 — frame sampling: expand each "video" into every `FrameStep`-th
    * frame row with a per-frame signature (the stub stands in for a frame
    * decode+embed). Sampling is *relational* — explode(sequence) — so
    * Catalyst plans it as a generator, not opaque user code: frame rows
    * partition with their parent rows and downstream filters on frame_idx
    * prune inside the expansion.
    */
  def m2FrameSample(s: SparkSession, dir: String): DataFrame = {
    val b2 = (conv(substring(col("h"), 5, 2), 16, 10).cast("int") % 30)
    load(s, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("n_frames", lit(1) + b2)
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(FrameStep)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        substring(md5(concat(col("doc_id").cast("string"), lit(":"),
          col("frame_idx").cast("string"), lit(":"), col("h"))), 1, 8)
          .as("frame_sig"))
  }

  private val ThumbMax = 256L

  /** m3 — resize planning: target thumbnail dims preserving aspect ratio
    * (longest side → `ThumbMax`, integer floor). The actual pixel resample
    * is the stubbed codec's job; the dimension math — what the pipeline
    * schedules and validates — is exact and oracle-checked. Integer-only
    * arithmetic: `w*256 div max(w,h)` avoids float rounding divergence.
    */
  def m3Thumbnail(s: SparkSession, dir: String): DataFrame =
    m1MultimodalMeta(s, dir)
      .withColumn("long_side", greatest(col("width"), col("height")))
      .select(col("doc_id"), col("width"), col("height"),
        when(col("long_side") <= ThumbMax, col("width"))
          .otherwise(expr(s"(width * $ThumbMax) div long_side")).as("thumb_w"),
        when(col("long_side") <= ThumbMax, col("height"))
          .otherwise(expr(s"(height * $ThumbMax) div long_side")).as("thumb_h"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_multimodal_meta" -> m1MultimodalMeta,
    "m2_frame_sample" -> m2FrameSample,
    "m3_thumbnail" -> m3Thumbnail)

  // Hex-pair → byte value, mirroring MessageDigest output hex-by-hex.
  private def hexByteSql(i: Int): String = {
    val hi = s"(strpos('0123456789abcdef', substr(h, ${2 * i + 1}, 1)) - 1)"
    val lo = s"(strpos('0123456789abcdef', substr(h, ${2 * i + 2}, 1)) - 1)"
    s"(16 * $hi + $lo)"
  }

  val oracle: Map[String, String] = Map(
    "m1_multimodal_meta" ->
      s"""WITH h AS (SELECT doc_id, md5(text) AS h, octet_length(CAST(text AS BLOB)) AS n FROM documents)
         |SELECT doc_id,
         |  CAST(64 + 8 * (${hexByteSql(0)} % 64) AS BIGINT) AS width,
         |  CAST(64 + 8 * (${hexByteSql(1)} % 64) AS BIGINT) AS height,
         |  CAST(1 + (${hexByteSql(2)} % 30) AS BIGINT) AS n_frames,
         |  CAST(n AS BIGINT) AS payload_bytes
         |FROM h""".stripMargin,
    "m2_frame_sample" ->
      s"""WITH h AS (SELECT doc_id, md5(text) AS h FROM documents),
         |f AS (SELECT doc_id, h, 1 + (${hexByteSql(2)} % 30) AS n_frames FROM h),
         |fr AS (SELECT doc_id, h,
         |         unnest(generate_series(0, n_frames - 1, $FrameStep)) AS i
         |       FROM f)
         |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
         |  substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR) || ':' || h), 1, 8)
         |    AS frame_sig
         |FROM fr""".stripMargin,
    "m3_thumbnail" ->
      s"""WITH h AS (SELECT doc_id, md5(text) AS h FROM documents),
         |m AS (SELECT doc_id,
         |    CAST(64 + 8 * (${hexByteSql(0)} % 64) AS BIGINT) AS width,
         |    CAST(64 + 8 * (${hexByteSql(1)} % 64) AS BIGINT) AS height
         |  FROM h),
         |g AS (SELECT doc_id, width, height,
         |    greatest(width, height) AS long_side FROM m)
         |SELECT doc_id, width, height,
         |  CASE WHEN long_side <= 256 THEN width
         |       ELSE (width * 256) // long_side END AS thumb_w,
         |  CASE WHEN long_side <= 256 THEN height
         |       ELSE (height * 256) // long_side END AS thumb_h
         |FROM g""".stripMargin)
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.load

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded per-partition in batches.
  *
  * The decode path is LIVE for the formats the JDK ships codecs for
  * (PNG/JPEG/GIF/BMP via `javax.imageio` — [[decodeImage]]); payloads
  * that aren't decodable images fall back to the deterministic
  * [[decodeStub]]. The testdata carries no media column at all (the
  * `documents` payload is UTF-8 text bytes — never a valid image), so
  * the oracled queries exercise exactly the stub branch while
  * MultimodalSpec pins the real branch on PNG/JPEG bytes it encodes
  * in-test. The Spark-side shape a 100 TB media pipeline needs is the
  * same either way:
  *   - payloads ride a `BinaryType` column next to typed metadata;
  *   - decode runs via `mapPartitions` over an iterator (the Scala analog
  *     of a batched pandas-UDF), so codec init amortizes once per
  *     partition and batches stream without materializing a partition in
  *     memory;
  *   - output is a typed Dataset row (schema checked at compile time).
  *
  * The stub derives metadata purely from the md5 of the payload, so the
  * DuckDB oracle reproduces it from hex math — the plumbing is
  * correctness-gated even where the codec path can't run.
  */
object Multimodal {

  /** Typed decoded-media row. */
  final case class MediaMeta(
      doc_id: Long, width: Long, height: Long, n_frames: Long,
      payload_bytes: Long)

  /** Formats the live decode accepts. Deliberately NOT "whatever
    * ImageIO finds a reader for": the JDK's WBMP reader has no magic
    * number and accepts near-arbitrary bytes starting 0x00 0x00, which
    * would mis-decode random binary (video containers, ciphertext) into
    * fabricated dimensions instead of routing it to the stub branch.
    */
  private val AllowedFormats = Set("png", "jpeg", "gif", "bmp")

  /** Pixel-count ceiling (≈256 MB of ARGB). Image headers are untrusted
    * input: dimensions are read from the READER (header metadata) and
    * checked BEFORE `read()` allocates the pixel buffer — otherwise a
    * corrupt/adversarial header claiming 60000×60000 turns into a
    * multi-GB allocation and an executor-killing OutOfMemoryError that
    * no catch can make safe.
    */
  private val MaxPixels = 64L * 1024 * 1024

  /** Guarded ImageIO read shared by decode and resize: format
    * allowlist, header-dimension cap, memory-backed input stream (the
    * default ImageIO path creates and deletes a DISK cache temp file
    * per call — pure per-row I/O overhead in the m1/m3 hot path).
    */
  private def readImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    // Null guard BEFORE the stream wrappers: ByteArrayInputStream(null)
    // NPEs outside the try below, and a nullable payload column is the
    // normal case in a real pipeline.
    if (payload == null) return None
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          if (!AllowedFormats.contains(
              reader.getFormatName.toLowerCase(java.util.Locale.ROOT))) None
          else {
            reader.setInput(iis)
            val (w, h) = (reader.getWidth(0).toLong, reader.getHeight(0).toLong)
            if (w <= 0 || h <= 0 || w * h > MaxPixels) None
            else Option(reader.read(0))
          }
        } finally reader.dispose()
      }
    } catch { case _: java.io.IOException | _: RuntimeException => None }
    finally iis.close()
  }

  /** Real image decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP — the
    * codecs every JVM ships; no external libraries). Returns None when
    * the payload isn't a decodable image under [[readImage]]'s guards:
    * no confident reader, disallowed format, implausible header
    * dimensions, or a recognized-but-corrupt stream — all mean "not an
    * image" here. Still images report one frame.
    */
  private[graft] def decodeImage(docId: Long, payload: Array[Byte]): Option[MediaMeta] =
    readImage(payload).map(img => MediaMeta(
      doc_id = docId,
      width = img.getWidth.toLong,
      height = img.getHeight.toLong,
      n_frames = 1L,
      payload_bytes = payload.length.toLong))

  /** STUB — stands in for decoding formats the JVM has no codec for
    * (video, audio). Deterministic function of the payload's md5 so
    * tests and the oracle can pin it.
    */
  private[graft] def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
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

  /** Full decode: the real codec first, stub for everything else. */
  private[graft] def decode(docId: Long, payload: Array[Byte]): MediaMeta =
    decodeImage(docId, payload).getOrElse(decodeStub(docId, payload))

  /** Real pixel resample via Graphics2D (bilinear), preserving aspect
    * ratio with the same integer dimension math m3 plans
    * (`side * maxSide div longSide`), re-encoded as PNG. Identity
    * (no-op) when the image already fits. None when the payload isn't a
    * decodable image — a real pipeline routes those to the dead-letter
    * side, it doesn't fabricate pixels.
    */
  private[graft] def resizeImage(payload: Array[Byte], maxSide: Long): Option[Array[Byte]] =
    try {
      readImage(payload).map { img =>
        val (w, h) = (img.getWidth.toLong, img.getHeight.toLong)
        val long = math.max(w, h)
        if (long <= maxSide) payload
        else {
          // max(1, …): an extreme aspect ratio (2000×1 at maxSide 256)
          // floors the short side to 0, and a 0-dim BufferedImage throws —
          // which the not-an-image catch below would silently misroute.
          val (tw, th) = (math.max(1L, w * maxSide / long).toInt,
            math.max(1L, h * maxSide / long).toInt)
          val out = new java.awt.image.BufferedImage(
            tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, tw, th, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          bos.toByteArray
        }
      }
    } catch { case _: java.io.IOException | _: RuntimeException => None }

  /** m1 — binary payload column → per-partition batched decode → typed
    * metadata. The payload here is synthesized from `text` (UTF-8 bytes)
    * since testdata carries no real media — such payloads take
    * [[decode]]'s stub branch; real PNG/JPEG bytes through the SAME
    * operator take the live ImageIO branch (MultimodalSpec).
    */
  def m1MultimodalMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val withPayload = load(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    decodeMeta(withPayload.toDF("doc_id", "payload"))
  }

  /** The decode operator itself, payload frame in → typed metadata out —
    * the surface a media pipeline calls with real bytes.
    */
  def decodeMeta(payloads: DataFrame): DataFrame = {
    val s = payloads.sparkSession
    import s.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      // A null id or payload has nothing to decode or stub (md5(null)
      // NPEs); dropped here, dead-lettered upstream in a real pipeline.
      .filter(col("doc_id").isNotNull && col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      // Plain streaming map — mapPartitions already amortizes codec init
      // once per partition, and the per-row decode has no batch-level
      // state, so buffering batches would only multiply peak memory by
      // the batch size (64 payloads in flight for zero gain).
      .mapPartitions(_.map { case (id, payload) => decode(id, payload) })
      .toDF()
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

  /** 64-bit average hash (aHash) of a decoded image: bilinear 8×8
    * grayscale downsample, bit i set when pixel i is brighter than the
    * mean. Integer-only luminance ((77r+150g+29b) >> 8) and integer
    * mean, so the hash is a deterministic function of the decoded
    * pixels. Near-duplicate images (re-encodes, small edits, minor
    * crops) land within a few bits; unrelated images differ in ~32.
    */
  private[graft] def aHash(img: java.awt.image.BufferedImage): Long = {
    val small = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = small.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, 8, 8, null)
    } finally g.dispose()
    val lum = new Array[Long](64)
    var i = 0
    while (i < 64) {
      val rgb = small.getRGB(i % 8, i / 8)
      lum(i) = (77L * ((rgb >> 16) & 0xFF) + 150L * ((rgb >> 8) & 0xFF) +
        29L * (rgb & 0xFF)) >> 8
      i += 1
    }
    val mean = lum.sum / 64
    lum.zipWithIndex.foldLeft(0L) { case (acc, (l, idx)) =>
      if (l > mean) acc | (1L << idx) else acc
    }
  }

  /** Perceptual hashes for a payload frame (`doc_id`, `payload`): one
    * (doc_id, phash) row per DECODABLE image; non-images are dropped
    * (route them via [[decodeMeta]]'s stub if they need accounting).
    * Same batched `mapPartitions` shape as decodeMeta.
    */
  def imageHashes(payloads: DataFrame): DataFrame = {
    val s = payloads.sparkSession
    import s.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .filter(col("doc_id").isNotNull && col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        readImage(payload).map(img => (id, aHash(img)))
      }).toDF("doc_id", "phash")
  }

  /** m4 — image near-dup pairs by perceptual-hash hamming distance ≤
    * `maxHamming` (≤ 3 for the recall guarantee). Same banded-LSH shape
    * as d8b, with recall that is EXACT for every pair whose shared
    * band's bucket stays within `maxBucket` — not unconditionally: the
    * 64-bit hash splits into 4 disjoint 16-bit bands, and by pigeonhole
    * any pair within hamming 3 agrees on at least one whole band, so
    * the band-equality self-join finds every such pair and
    * `bit_count(xor)` filters candidates exactly. The cap is therefore
    * a RECALL bound, not just a performance knob: an over-cap bucket
    * (a constant hash — e.g. black frames — that would otherwise melt
    * one task into a quadratic join) contributes NO pairs, and a pair
    * whose only agreeing band lands in such a bucket is missed
    * (MultimodalSpec pins this: 6 identical images at cap 5 yield zero
    * pairs). Raise `maxBucket` when completeness among mass-duplicate
    * hashes matters more than the bounded worst case.
    */
  def m4ImageNearDup(hashes: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    // Not a tunable-past-3 knob: with 4 disjoint bands, pigeonhole only
    // guarantees a shared band up to hamming 3. maxHamming = 4 would
    // RETURN results while silently missing pairs whose 4 differing bits
    // fall one per band — fail loudly instead.
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-band recall guarantee holds only for maxHamming <= 3, got $maxHamming")
    import org.apache.spark.sql.expressions.Window
    val banded = hashes
      .select(col("doc_id"), col("phash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("band_val",
        expr("shiftrightunsigned(phash, band * 16)").bitwiseAND(lit(0xFFFFL)))
      .withColumn("_n", count(lit(1)).over(
        Window.partitionBy(col("band"), col("band_val"))))
      .filter(col("_n") <= maxBucket)
      .drop("_n")
    val a = banded.select(col("band"), col("band_val"),
      col("doc_id").as("id_a"), col("phash").as("h_a"))
    val b = banded.select(col("band"), col("band_val"),
      col("doc_id").as("id_b"), col("phash").as("h_b"))
    a.join(b, Seq("band", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** m4's oracled entry. [[imageHashes]] only emits for decodable
    * images and the testdata carries none, so the GATE derives the
    * 64-bit perceptual hash the way m1 derives metadata: a
    * deterministic 56-bit value from the payload md5 (7 hex bytes —
    * positive in a signed long, so `>>` ≡ logical shift in both
    * engines), which DuckDB reproduces with hex math. Every 10th doc
    * additionally plants a hamming-1 twin (doc_id + 1e6, bit
    * `doc_id % 56` flipped), so the banded self-join + hamming filter is
    * exercised with NON-empty output — an all-random hash set would
    * pass vacuously on zero pairs. Real images flow through
    * [[imageHashes]] into the same [[m4ImageNearDup]] operator
    * (MultimodalSpec pins that branch, including the pigeonhole recall
    * bound).
    */
  def m4ImageNearDupStub(s: SparkSession, dir: String): DataFrame = {
    val phash = (0 until 7).map { i =>
      shiftleft(conv(substring(col("h"), 2 * i + 1, 2), 16, 10).cast("long"),
        8 * i)
    }.reduce(_ + _)
    // Twin ids are doc_id + 1e6; a REAL doc_id equal to some twin id
    // would corrupt the pair set. Check the actual collision condition
    // (∃ d, d' real: d' = d + 1e6 ∧ d % 10 = 0) — a naive "all ids
    // < 1e6" guard false-positives on the scale corpora, whose ids are
    // stride-offset per copy (2^33·k + small: far above 1e6, never
    // within 1e6 of another cluster). One bounded semi-join on the id
    // column at build time; gate-stub path only.
    val ids = load(s, dir, "documents").select(col("doc_id"))
    val clash = ids
      .join(ids.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id")),
        Seq("doc_id"), "left_semi")
      .limit(1).count()
    require(clash == 0L,
      "m4 stub: twin id space (doc_id + 1e6) collides with real doc_ids")
    val hashes = load(s, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("h"))
      .select(col("doc_id"), phash.as("phash"))
    val twins = hashes.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        // SQL-form shiftleft: the Scala API pins the shift amount to a
        // literal Int, the SQL form takes a per-row expression.
        expr("phash ^ shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 56 AS INT))")
          .as("phash"))
    m4ImageNearDup(hashes.union(twins))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_multimodal_meta" -> m1MultimodalMeta,
    "m2_frame_sample" -> m2FrameSample,
    "m3_thumbnail" -> m3Thumbnail,
    "m4_image_neardup" -> m4ImageNearDupStub)

  // Hex-pair → byte value, mirroring MessageDigest output hex-by-hex.
  private def hexByteSql(i: Int): String = {
    val hi = s"(strpos('0123456789abcdef', substr(h, ${2 * i + 1}, 1)) - 1)"
    val lo = s"(strpos('0123456789abcdef', substr(h, ${2 * i + 2}, 1)) - 1)"
    s"(16 * $hi + $lo)"
  }

  val oracle: Map[String, String] = Map(
    "m1_multimodal_meta" ->
      // WHERE mirrors decodeMeta's null-payload drop (vacuous on the
      // fixtures — no null text — but keeps the formulations aligned).
      s"""WITH h AS (SELECT doc_id, md5(text) AS h, octet_length(CAST(text AS BLOB)) AS n
         |           FROM documents WHERE text IS NOT NULL)
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
      s"""WITH h AS (SELECT doc_id, md5(text) AS h FROM documents
         |           WHERE text IS NOT NULL),
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
         |FROM g""".stripMargin,
    "m4_image_neardup" -> {
      val phashSql = (0 until 7)
        .map(i => s"(CAST(${hexByteSql(i)} AS BIGINT) << ${8 * i})")
        .mkString(" + ")
      s"""WITH h AS (SELECT doc_id, md5(text) AS h FROM documents),
         |base AS (SELECT doc_id, $phashSql AS phash FROM h),
         |twins AS (SELECT doc_id + 1000000 AS doc_id,
         |    xor(phash, CAST(1 AS BIGINT) << CAST(doc_id % 56 AS INTEGER)) AS phash
         |  FROM base WHERE doc_id % 10 = 0),
         |hashes AS (SELECT * FROM base UNION ALL SELECT * FROM twins),
         |banded AS (SELECT doc_id, phash, band,
         |    (phash >> (band * 16)) & 65535 AS band_val,
         |    count(*) OVER (PARTITION BY band, (phash >> (band * 16)) & 65535) AS _n
         |  FROM hashes CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b),
         |kept AS (SELECT * FROM banded WHERE _n <= 1000)
         |SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b,
         |  CAST(bit_count(xor(a.phash, bb.phash)) AS BIGINT) AS hamming
         |FROM kept a
         |JOIN kept bb ON a.band = bb.band AND a.band_val = bb.band_val
         |  AND a.doc_id < bb.doc_id
         |WHERE bit_count(xor(a.phash, bb.phash)) <= 3""".stripMargin
    })
}

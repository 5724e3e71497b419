package graft

import java.io.ByteArrayOutputStream
import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** The live ImageIO decode branch, on real PNG/JPEG bytes encoded
  * in-test (the JDK ships these codecs — no external media libraries,
  * no fixture files). The oracled m1/m3 queries exercise only the stub
  * branch (testdata payloads are UTF-8 text, never a valid image), so
  * this spec is what keeps the real branch honest.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session

  private def encode(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    // Non-constant pixels so JPEG's DCT has real content to code.
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, bos), s"no JDK writer for $format")
    bos.toByteArray
  }

  test("decodeImage reads real PNG and JPEG dimensions") {
    val png = Multimodal.decodeImage(1L, encode(320, 200, "png"))
    assert(png.contains(Multimodal.MediaMeta(1L, 320L, 200L, 1L,
      encode(320, 200, "png").length.toLong)))
    val jpg = Multimodal.decodeImage(2L, encode(48, 96, "jpg")).get
    assert((jpg.width, jpg.height, jpg.n_frames) == (48L, 96L, 1L))
  }

  test("decode falls back to the stub on non-image payloads") {
    val payload = "not an image at all".getBytes("UTF-8")
    assert(Multimodal.decodeImage(3L, payload).isEmpty)
    assert(Multimodal.decode(3L, payload) == Multimodal.decodeStub(3L, payload))
    // Truncated PNG: recognized container, corrupt stream — still stub.
    val broken = encode(64, 64, "png").take(24)
    assert(Multimodal.decode(4L, broken) == Multimodal.decodeStub(4L, broken))
  }

  test("magicless WBMP bytes take the stub, not a fabricated decode") {
    // The JDK's WBMP reader has no magic number and accepts arbitrary
    // bytes starting 0x00 0x00 — exactly what raw binary/video payloads
    // can look like. The format allowlist must route these to the stub.
    val wbmpish = Array[Byte](0, 0, 0x18, 0x18) ++ Array.fill[Byte](128)(0x55)
    assert(Multimodal.decodeImage(5L, wbmpish).isEmpty,
      "WBMP-shaped binary must not decode as an image")
    assert(Multimodal.decode(5L, wbmpish) == Multimodal.decodeStub(5L, wbmpish))
  }

  test("header-claimed huge dimensions are rejected before allocation") {
    // Patch a valid PNG's IHDR to claim 60000x60000 (and fix the CRC):
    // the reader reports the header dims, the pixel-count cap must
    // reject BEFORE read() allocates a multi-GB buffer.
    val png = encode(32, 32, "png")
    def putInt(arr: Array[Byte], off: Int, v: Int): Unit = {
      arr(off) = (v >>> 24).toByte; arr(off + 1) = (v >>> 16).toByte
      arr(off + 2) = (v >>> 8).toByte; arr(off + 3) = v.toByte
    }
    val huge = png.clone()
    putInt(huge, 16, 60000) // IHDR width  (bytes 16-19)
    putInt(huge, 20, 60000) // IHDR height (bytes 20-23)
    val crc = new java.util.zip.CRC32()
    crc.update(huge, 12, 17) // chunk type "IHDR" + 13 data bytes
    putInt(huge, 29, crc.getValue.toInt)
    assert(Multimodal.decodeImage(6L, huge).isEmpty,
      "60000x60000 header must be rejected by the pixel cap")
    assert(Multimodal.resizeImage(huge, 256L).isEmpty)
  }

  test("decodeMeta routes mixed payloads per-row: live dims for images, stub for the rest") {
    import spark.implicits._
    val textBytes = "plain text payload".getBytes("UTF-8")
    val rows = Seq(
      (10L, encode(128, 64, "png")),
      (11L, textBytes))
    val out = Multimodal.decodeMeta(rows.toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(10L) == ((128L, 64L, 1L)))
    val stub = Multimodal.decodeStub(11L, textBytes)
    assert(out(11L) == ((stub.width, stub.height, stub.n_frames)))
  }

  test("resizeImage: real resample matches m3's integer dimension math; no-op under the cap") {
    val big = encode(640, 400, "png")
    val thumb = Multimodal.resizeImage(big, 256L).get
    val meta = Multimodal.decodeImage(0L, thumb).get
    // 640×400 → long side 640 → (640*256 div 640, 400*256 div 640)
    assert((meta.width, meta.height) == (256L, 160L))
    val small = encode(100, 50, "png")
    assert(Multimodal.resizeImage(small, 256L).get.sameElements(small),
      "already-fitting image must pass through byte-identical")
    assert(Multimodal.resizeImage("garbage".getBytes("UTF-8"), 256L).isEmpty)
    // Extreme aspect ratio: the short side floors to 0 in the integer
    // math and must clamp to 1, not crash (or worse, misroute a valid
    // image to None through the not-an-image catch).
    val banner = encode(2000, 1, "png")
    val bm = Multimodal.decodeImage(0L, Multimodal.resizeImage(banner, 256L).get).get
    assert((bm.width, bm.height) == (256L, 1L), s"got ${(bm.width, bm.height)}")
  }

  /** 64×64 image of 64 constant 8×8 blocks — block i bright iff bit i of
    * `pattern` is set. aHash's 8×8 bilinear downsample lands each output
    * pixel strictly inside one block (centers at 8i+3.5), so the hash's
    * bit i is EXACTLY pattern's bit i whenever bright/dark straddle the
    * mean — hamming distances in these tests are constructed, not
    * hoped-for.
    */
  private def encodeBlocks(pattern: Long, format: String = "png"): Array[Byte] = {
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    (0 until 64).foreach { i =>
      val c = if (((pattern >> i) & 1L) == 1L) 0xC8C8C8 else 0x323232 // 200 / 50
      val (bx, by) = ((i % 8) * 8, (i / 8) * 8)
      (bx until bx + 8).foreach(x => (by until by + 8).foreach(y =>
        img.setRGB(x, y, c)))
    }
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, bos))
    bos.toByteArray
  }

  private val checker = 0x5555555555555555L // alternating blocks, mean-straddling

  test("aHash: constructed block patterns give exact, counted hamming distances") {
    def hashOf(bytes: Array[Byte]): Long =
      Multimodal.imageHashes(
        spark.createDataFrame(Seq((1L, bytes))).toDF("doc_id", "payload"))
        .collect()(0).getLong(1)
    val base = hashOf(encodeBlocks(checker))
    val twoFlipped = hashOf(encodeBlocks(checker ^ 3L)) // blocks 0,1 toggled
    val inverted = hashOf(encodeBlocks(~checker))
    assert(java.lang.Long.bitCount(base ^ twoFlipped) == 2)
    assert(java.lang.Long.bitCount(base ^ inverted) == 64)
    // Lossless re-encode = identical pixels = identical hash.
    assert(hashOf(encodeBlocks(checker, "bmp")) == base)
  }

  test("m4: near-dup pairs by hamming — re-encodes and small edits pair, inverses don't, non-images drop") {
    import spark.implicits._
    val frame = Seq(
      (1L, encodeBlocks(checker)),          // base (png)
      (2L, encodeBlocks(checker, "bmp")),   // lossless re-encode: hamming 0
      (3L, encodeBlocks(checker ^ 3L)),     // two-block edit: hamming 2
      (4L, encodeBlocks(~checker)),         // inverse: hamming 64
      (5L, "not an image".getBytes("UTF-8")) // dropped before hashing
    ).toDF("doc_id", "payload")
    val hashes = Multimodal.imageHashes(frame)
    assert(hashes.count() == 4)
    val pairs = Multimodal.m4ImageNearDup(hashes)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 0L), (1L, 3L, 2L), (2L, 3L, 2L)))
  }

  test("m4 pigeonhole guarantee, exhaustively: every hamming<=3 perturbation " +
    "shares at least one 16-bit band with the original") {
    def bandsEqual(a: Long, b: Long): Boolean =
      (0 until 4).exists(i => ((a >>> (i * 16)) & 0xFFFFL) == ((b >>> (i * 16)) & 0xFFFFL))
    val rnd = new scala.util.Random(7)
    val bases = Seq(0L, -1L, 0x5555555555555555L) ++ Seq.fill(5)(rnd.nextLong())
    for (base <- bases) {
      // all 1-bit and all 2-bit flips — exhaustive (64 + 2016 cases)
      for (i <- 0 until 64) {
        assert(bandsEqual(base, base ^ (1L << i)))
        for (j <- 0 until i)
          assert(bandsEqual(base, base ^ (1L << i) ^ (1L << j)))
      }
      // 3-bit flips: exhaustive would be 41664/base; a fixed sample of
      // triples plus the adversarial one-per-band-adjacent shapes
      for (_ <- 0 until 2000) {
        val Seq(i, j, k) = rnd.shuffle((0 until 64).toList).take(3)
        assert(bandsEqual(base, base ^ (1L << i) ^ (1L << j) ^ (1L << k)))
      }
      // and the counterexample the require() guards: 4 flips, one per
      // band, CAN lose every band (shows the bound is tight, not lax)
      val fourSpread = base ^ 1L ^ (1L << 16) ^ (1L << 32) ^ (1L << 48)
      assert(!bandsEqual(base, fourSpread))
    }
  }

  test("m4: null payloads/ids drop cleanly; maxHamming past the pigeonhole bound fails loudly") {
    import spark.implicits._
    val frame = Seq(
      (Option(1L), Option(encodeBlocks(checker))),
      (Option(2L), Option.empty[Array[Byte]]),   // null payload: dropped, not NPE
      (Option.empty[Long], Option(encodeBlocks(checker))) // null id: dropped
    ).toDF("doc_id", "payload")
    val hashes = Multimodal.imageHashes(frame)
    assert(hashes.as[(Long, Long)].collect().map(_._1).toSeq == Seq(1L))
    intercept[IllegalArgumentException] {
      Multimodal.m4ImageNearDup(hashes, maxHamming = 4)
    }
  }

  test("m4 end-to-end over a parquet-stored PNG corpus: decode→hash→band→pair " +
    "on disk-round-tripped bytes") {
    import spark.implicits._
    // A deterministic PNG corpus committed to parquet at test time (the
    // fixture documents table has no media column), covering every edge
    // the in-memory tests prove: lossless re-encode (hamming 0), edits at
    // the hamming-3 boundary, the 4-spread counterexample past it, an
    // inverse, and a non-image payload — all surviving a binary-column
    // disk round trip through the real source path.
    val dir = java.nio.file.Files.createTempDirectory("m4-corpus").toString
    Seq(
      (1L, encodeBlocks(checker)),               // base
      (2L, encodeBlocks(checker, "bmp")),        // lossless re-encode: h=0
      (3L, encodeBlocks(checker ^ 3L)),          // two-block edit: h=2
      (4L, encodeBlocks(checker ^ 7L)),          // three-block edit: h=3 vs base
      (5L, encodeBlocks(~checker)),              // inverse: h=64
      (6L, "definitely not an image".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
      .repartition(2) // multiple files: pairing must cross file boundaries
      .write.parquet(s"$dir/images")
    val stored = spark.read.parquet(s"$dir/images")
    assert(stored.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val hashes = Multimodal.imageHashes(stored)
    assert(hashes.count() == 5, "non-image dropped, images hashed")
    val pairs = Multimodal.m4ImageNearDup(hashes)
      .as[(Long, Long, Long)].collect().toSet
    // h(3,4): patterns differ in block 2 only (3^7=4) → hamming 1.
    assert(pairs == Set(
      (1L, 2L, 0L), (1L, 3L, 2L), (1L, 4L, 3L),
      (2L, 3L, 2L), (2L, 4L, 3L), (3L, 4L, 1L)))
    // The hamming-4 spread case on disk too: no pair past the guarantee.
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("m4: an over-cap degenerate bucket (constant hash) yields zero pairs, never a quadratic task") {
    import spark.implicits._
    val copies = (1L to 6L).map(i => (i, encodeBlocks(checker))).toDF("doc_id", "payload")
    val hashes = Multimodal.imageHashes(copies)
    // 6 identical hashes, cap 5: every band bucket is over cap — all
    // filtered (the documented trade: a pathological constant-content
    // cluster is dropped, not allowed to melt one executor).
    assert(Multimodal.m4ImageNearDup(hashes, maxHamming = 3, maxBucket = 5).isEmpty)
    // At cap (5 docs), all C(5,2) = 10 pairs surface.
    assert(Multimodal.m4ImageNearDup(hashes.limit(5), maxBucket = 5).count() == 10)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite
import graft.stream.{Ingest, State}

/** Structured-Streaming semantics of the ingest+state pipeline (SURVEY
  * §2.9): MemoryStream replay of fixture events through the SAME code
  * paths the batch tests cover — update-mode latest-per-key, append-mode
  * watermarked windows, out-of-order and malformed input (FIXTURES.md §A8).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def facJson(id: String, ts: String, p: Double, c: Double) =
    s"""{"facility_id":"$id","timestamp":"$ts","power_mw":$p,"co2_tonnes":$c}"""

  private def withQuery[T](q: StreamingQuery)(body: => T): T =
    try body finally q.stop()

  /** Run `body` with the RocksDB state store provider active — the
    * provider a 100 TB deployment would run (state larger than heap,
    * changelog checkpointing). Queries STARTED inside pick it up.
    */
  private def withRocksDB[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("latest-per-key over a stream: update mode, out-of-order upsert (T4/A5)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val latest = State.latestPerFacility(
      Ingest.facilityEvents(in.toDF().withColumnRenamed("value", "value")))
    val q = latest.writeStream.outputMode("update")
      .format("memory").queryName("latest_t").start()
    withQuery(q) {
      in.addData(
        facJson("ALP", "2025-10-15T10:05:00+11:00", 10.0, 1.0),
        "garbage not json",
        facJson("BET", "2025-10-15T10:05:00+11:00", 95.0, 80.0))
      q.processAllAvailable()
      // batch 2: a newer ALP reading and an OLDER out-of-order one — the
      // newer must win, the old one must not regress state.
      in.addData(
        facJson("ALP", "2025-10-15T10:15:00+11:00", 20.0, 2.0),
        facJson("ALP", "2025-10-15T10:00:00+11:00", 99.0, 9.0))
      q.processAllAvailable()
      val state = spark.table("latest_t")
        .groupBy($"facility_id")
        .agg(max_by(struct($"timestamp", $"power_mw"),
          struct(to_timestamp($"timestamp"), $"timestamp")).as("l"))
        .select($"facility_id", $"l.*")
        .as[(String, String, Double)].collect()
        .map { case (k, ts, p) => k -> ((ts, p)) }.toMap
      assert(state("ALP") == (("2025-10-15T10:15:00+11:00", 20.0)))
      assert(state("BET") == (("2025-10-15T10:05:00+11:00", 95.0)))
    }
  }

  test("watermarked 5-min windows: append emits closed buckets, drops too-late rows (T2/T3)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val totals = State.windowedTotals(
      Ingest.facilityEvents(in.toDF()), watermark = "10 minutes")
    val q = totals.writeStream.outputMode("append")
      .format("memory").queryName("totals_t").start()
    withQuery(q) {
      in.addData(
        facJson("ALP", "2025-10-15T10:05:00+11:00", 10.0, 1.0),
        facJson("BET", "2025-10-15T10:07:00+11:00", 5.0, 2.0))
      q.processAllAvailable()
      // Advance event time far enough that watermark (max - 10 min) passes
      // the 10:05 bucket → it must be emitted, summed across facilities.
      in.addData(facJson("ALP", "2025-10-15T10:30:00+11:00", 7.0, 0.5))
      q.processAllAvailable()
      // This event is far behind the watermark → silently dropped (T3).
      in.addData(facJson("ALP", "2025-10-15T10:06:00+11:00", 1000.0, 999.0))
      in.addData(facJson("ALP", "2025-10-15T10:45:00+11:00", 3.0, 0.1))
      q.processAllAvailable()
      val emitted = spark.table("totals_t")
        .select($"bucket_start".cast("string"), $"total_power_mw").as[(String, Double)]
        .collect().toMap
      // 10:05+11:00 == 23:05 UTC bucket; late 1000.0 row must NOT appear.
      assert(emitted("2025-10-14 23:05:00") == 15.0)
      assert(!emitted.values.exists(_ >= 1000.0))
    }
  }

  test("hopping windows: one event lands in exactly size/slide overlapping buckets") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val totals = State.hoppingTotals(
      Ingest.facilityEvents(in.toDF()), watermark = "10 minutes")
    val q = totals.writeStream.outputMode("append")
      .format("memory").queryName("totals_hop").start()
    withQuery(q) {
      in.addData(
        facJson("ALP", "2025-10-15T10:05:00+11:00", 10.0, 1.0),
        facJson("BET", "2025-10-15T10:07:00+11:00", 5.0, 2.0))
      q.processAllAvailable()
      in.addData(facJson("ALP", "2025-10-15T10:40:00+11:00", 7.0, 0.5))
      q.processAllAvailable()
      val emitted = spark.table("totals_hop")
        .select($"bucket_start".cast("string"), $"total_power_mw").as[(String, Double)]
        .collect().toMap
      // 10:05/10:07 +11:00 = 23:05/23:07 UTC — both inside BOTH the
      // [23:00, 23:10) and [23:05, 23:15) hopping windows, so the same
      // 15.0 total must be emitted TWICE, once per overlapping bucket.
      assert(emitted("2025-10-14 23:00:00") == 15.0)
      assert(emitted("2025-10-14 23:05:00") == 15.0)
    }
  }

  test("flatMapGroupsWithState dict-merge: partial events overlay field-wise (§2.10)") {
    import graft.stream.MergeState
    import graft.stream.MergeState.{MergedState, PartialEvent}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[PartialEvent]
    val q = MergeState.latestMerged(in.toDS()).writeStream
      .outputMode("update").format("memory").queryName("merge_t").start()
    withQuery(q) {
      in.addData(PartialEvent("ALP", "t1", 1000L, Some(10.0), Some(1.0)))
      q.processAllAvailable()
      // Partial update: only power arrives — co2 must carry over from t1.
      in.addData(PartialEvent("ALP", "t2", 2000L, Some(20.0), None))
      q.processAllAvailable()
      // Partial again: only co2 — power stays 20.0.
      in.addData(PartialEvent("ALP", "t3", 3000L, None, Some(3.0)))
      q.processAllAvailable()
      val last = spark.table("merge_t").as[MergedState].collect()
        .maxBy(_.timestamp)
      assert(last == MergedState("ALP", "t3", 20.0, 3.0))
    }
  }

  test("transformWithState dict-merge matches flatMapGroupsWithState semantics (RocksDB)") {
    import graft.stream.MergeState
    import graft.stream.MergeState.{MergedState, PartialEvent}
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val in = MemoryStream[PartialEvent]
      val q = MergeState.latestMergedTws(in.toDS()).writeStream
        .outputMode("update").format("memory").queryName("tws_t").start()
      withQuery(q) {
        in.addData(PartialEvent("ALP", "t1", 1000L, Some(10.0), Some(1.0)))
        q.processAllAvailable()
        in.addData(PartialEvent("ALP", "t2", 2000L, None, Some(2.5)))
        q.processAllAvailable()
        val last = spark.table("tws_t").as[MergedState].collect().maxBy(_.timestamp)
        assert(last == MergedState("ALP", "t2", 10.0, 2.5))
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming session windows: gap closes a session, watermark emits it") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val q = State.sessionTotals(Ingest.facilityEvents(in.toDF()))
      .writeStream.outputMode("append").format("memory").queryName("sess_t").start()
    withQuery(q) {
      // Two events 5 min apart (one session), then a 20-min gap (> 15-min
      // session gap) starts a second session.
      in.addData(
        facJson("ALP", "2025-10-15T10:00:00+11:00", 10.0, 1.0),
        facJson("ALP", "2025-10-15T10:05:00+11:00", 20.0, 2.0),
        facJson("ALP", "2025-10-15T10:25:00+11:00", 5.0, 0.5))
      q.processAllAvailable()
      // Advance the watermark far past both sessions so they emit.
      in.addData(facJson("BET", "2025-10-15T12:00:00+11:00", 1.0, 0.1))
      q.processAllAvailable()
      val sessions = spark.table("sess_t")
        .filter($"facility_id" === "ALP")
        .select($"n_events", $"session_power").as[(Long, Double)]
        .collect().sortBy(_._1)
      assert(sessions.toSeq == Seq((1L, 5.0), (2L, 30.0)))
    }
  }

  test("streaming dedup: at-least-once redelivery collapses under the watermark (T5)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val q = State.dedupEvents(Ingest.facilityEvents(in.toDF()))
      .writeStream.outputMode("append").format("memory").queryName("dedup_t").start()
    withQuery(q) {
      val e = facJson("ALP", "2025-10-15T10:05:00+11:00", 10.0, 1.0)
      in.addData(e, e) // duplicate delivery in one batch
      q.processAllAvailable()
      in.addData(e) // redelivery in a later batch, still inside watermark
      in.addData(facJson("ALP", "2025-10-15T10:10:00+11:00", 11.0, 1.1))
      q.processAllAvailable()
      val rows = spark.table("dedup_t").select($"timestamp").as[String].collect()
      assert(rows.sorted.toSeq == Seq(
        "2025-10-15T10:05:00+11:00", "2025-10-15T10:10:00+11:00"))
    }
  }

  test("streaming incremental dedup: corpus known drops, in-batch and cross-batch dups collapse") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((1L, "already known text")).toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)]
    val q = graft.ops.Dedup.incrementalDedupStream(
      in.toDF().toDF("doc_id", "text"), corpus)
      .writeStream.outputMode("append").format("memory").queryName("incr_t").start()
    withQuery(q) {
      // normalization must fold case/whitespace like the batch operator
      in.addData((2L, "Already   KNOWN\ttext"), (3L, "fresh a"), (4L, "FRESH  a"))
      q.processAllAvailable()
      val b1 = spark.table("incr_t").select($"doc_id").as[Long].collect().toSet
      assert(!b1.contains(2L), "corpus-known doc must be dropped")
      assert(b1.size == 1 && (b1 == Set(3L) || b1 == Set(4L)),
        s"in-batch dup must collapse to one keeper: $b1")
      in.addData((5L, "fresh a"), (6L, "brand new")) // redelivery + novel
      q.processAllAvailable()
      val b2 = spark.table("incr_t").select($"doc_id").as[Long].collect().toSet
      assert(!b2.contains(5L), "cross-batch redelivery must be suppressed by state")
      assert(b2.contains(6L) && b2.size == 2)
    }
  }

  test("deterministic streaming keeper == d10 batch keeper on the same replayed input (RocksDB)") {
    import graft.ops.Dedup
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val corpus = Seq((1L, "already known text")).toDF("doc_id", "text")
      val in = MemoryStream[(Long, String)]
      val q = Dedup.incrementalDedupStreamKeyed(
        in.toDF().toDF("doc_id", "text"), corpus)
        .writeStream.outputMode("update").format("memory")
        .queryName("keeper_t").start()
      withQuery(q) {
        // Adversarial arrival order: the LARGER id arrives first, the
        // true keeper (smaller id) only in a later batch — exactly where
        // dropDuplicates' first-seen keeper diverges from d10's min.
        in.addData((10L, "fresh a"), (12L, "fresh b"), (2L, "ALREADY  known\ttext"))
        q.processAllAvailable()
        in.addData((5L, "FRESH  a"), (12L, "fresh b"), (7L, "fresh c"))
        q.processAllAvailable()
        // Latest emission per fp == smallest emission (keepers only ever
        // revise downward) — compare the FULL fp→keeper map against the
        // batch-d10 semantics computed by the batch operator itself
        // (corpusFingerprints = min doc_id per normalized fingerprint)
        // over the replayed input minus corpus-known texts, so swapped
        // keepers across fingerprints cannot pass.
        val streamKeepers = spark.table("keeper_t")
          .groupBy($"fp").agg(min($"doc_id").as("doc_id"))
          .select($"fp", $"doc_id").as[(String, Long)].collect().toMap
        val batchKeepers = Dedup.corpusFingerprints(Seq(
            (10L, "fresh a"), (12L, "fresh b"),
            (5L, "FRESH  a"), (12L, "fresh b"), (7L, "fresh c"))
            .toDF("doc_id", "text"))
          .as[(String, Long)].collect().toMap
        assert(streamKeepers == batchKeepers,
          s"stream keepers must match d10 min-id keepers per fingerprint:" +
            s" $streamKeepers vs $batchKeepers")
        // The revision stream itself: fp(a) must have emitted 10 then 5.
        val aEmits = spark.table("keeper_t")
          .select($"doc_id").as[Long].collect().toSet
        assert(aEmits.contains(10L) && aEmits.contains(5L),
          s"keeper revision (10→5) must be visible in update mode: $aEmits")
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("keeper stability under at-least-once redelivery: duplicated+reordered " +
    "batches add zero emissions and cannot revise a keeper upward (T5)") {
    import graft.ops.Dedup
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB provider (multiple column
    // families) — same scoped override as the parity test above.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
    val corpus = Seq((1L, "already known text")).toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)]
    val q = Dedup.incrementalDedupStreamKeyed(
      in.toDF().toDF("doc_id", "text"), corpus)
      .writeStream.outputMode("update").format("memory")
      .queryName("keeper_redeliver_t").start()
    withQuery(q) {
      val batchA = Seq((10L, "fresh a"), (3L, "fresh b"))
      val batchB = Seq((5L, "FRESH  a"), (8L, "fresh c"))
      in.addData(batchA: _*)
      q.processAllAvailable()
      in.addData(batchB: _*)
      q.processAllAvailable()
      val before = spark.table("keeper_redeliver_t")
        .as[(String, Long)].collect().toSeq
      // At-least-once delivery: batch A arrives AGAIN verbatim, then a
      // reordered interleaving of both batches in one batch. Every row
      // is a re-arrival of an id the state has already seen (or beaten),
      // so the processor must emit NOTHING — in particular the (10,
      // "fresh a") redelivery after 5 became the keeper must not revise
      // the keeper upward, and the duplicate (3)/(8) must not re-emit.
      in.addData(batchA: _*)
      q.processAllAvailable()
      in.addData((8L, "fresh c"), (10L, "fresh a"), (3L, "fresh b"))
      q.processAllAvailable()
      val after = spark.table("keeper_redeliver_t")
        .as[(String, Long)].collect().toSeq
      assert(after.sorted == before.sorted,
        s"redelivery changed the emission set: $before -> $after")
      // Exactly one downward revision for fp(a) (10 then 5), one emission
      // each for b and c — the full multiset, so a phantom emission
      // anywhere fails, not only on the revised key.
      val perFp = after.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      assert(perFp.values.toSeq.map(_.size).sorted == Seq(1, 1, 2),
        s"unexpected emission counts: $perFp")
      // And the final keeper map still equals batch d10 over everything
      // delivered (redeliveries included — idempotent by min semantics).
      val streamKeepers = spark.table("keeper_redeliver_t")
        .groupBy($"fp").agg(min($"doc_id").as("doc_id"))
        .as[(String, Long)].collect().toMap
      val batchKeepers = Dedup.corpusFingerprints(
          (batchA ++ batchB ++ batchA).toDF("doc_id", "text"))
        .as[(String, Long)].collect().toMap
      assert(streamKeepers == batchKeepers)
    }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("foldBackCorpus: corpus' = corpus ∪ novel, idempotent, and the next d10 pass is empty") {
    import graft.ops.Dedup
    // Corpus fingerprints (d6 shape) + a d10 novelty batch (disjoint fps
    // by construction) fold into one keeper set; re-folding the same
    // novelty is a no-op; folding a smaller id for an existing fp lowers
    // its keeper (min semantics, matching d6/d10).
    val corpusFps = Seq(("fpA", 1L), ("fpB", 4L))
      .toDF("fp", "keeper_doc_id")
    val novel = Seq((7L, "fpC"), (9L, "fpD")).toDF("doc_id", "fp")
    val folded = Dedup.foldBackCorpus(corpusFps, novel)
    val m1 = folded.as[(String, Long)].collect().toMap
    assert(m1 == Map("fpA" -> 1L, "fpB" -> 4L, "fpC" -> 7L, "fpD" -> 9L))
    val again = Dedup.foldBackCorpus(folded, novel).as[(String, Long)].collect().toMap
    assert(again == m1, "re-folding the same novelty must be a no-op")
    val lower = Dedup.foldBackCorpus(folded, Seq((2L, "fpB")).toDF("doc_id", "fp"))
      .as[(String, Long)].collect().toMap
    assert(lower("fpB") == 2L, "smaller id lowers the keeper (min semantics)")
    // Round trip with the real operators on a tmp corpus: after folding
    // d10's novelty back, re-running the incremental stream over the same
    // batch finds nothing new.
    implicit val sqlCtx = spark.sqlContext
    val corpusDocs = Seq((1L, "known text")).toDF("doc_id", "text")
    val incoming = Seq((10L, "fresh x"), (11L, "fresh y"), (12L, "KNOWN  text"))
      .toDF("doc_id", "text")
    val novelty = Dedup.incrementalDedupStream(incoming, corpusDocs)
      .select($"doc_id", $"fp")
    val corpus2 = Dedup.foldBackCorpus(
      Dedup.corpusFingerprints(corpusDocs), novelty)
    // Re-running the same incoming batch against the folded corpus must
    // find nothing novel: join through the fingerprints of corpus2.
    val corpus2Docs = incoming.unionByName(corpusDocs)
      .join(corpus2.withColumnRenamed("keeper_doc_id", "doc_id"),
        Seq("doc_id"), "left_semi")
    assert(Dedup.incrementalDedupStream(incoming, corpus2Docs).count() == 0,
      "every fingerprint of the folded batch must now be corpus-known")
  }

  test("stream-stream join: facility ⋈ market on (region, 5-min bucket) with dual watermarks") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("ALP", "NSW1"), ("BET", "VIC1"))
      .toDF("facility_id", "region")
    val facIn = MemoryStream[String]
    val mktIn = MemoryStream[String]
    def mktJson(r: String, ts: String, p: Double, d: Double) =
      s"""{"region_id":"$r","timestamp":"$ts","price_dmwh":$p,"demand_mw":$d}"""
    val joined = State.facilityMarketJoin(
      Ingest.enrichFacility(Ingest.facilityEvents(facIn.toDF()), dim),
      Ingest.marketEvents(mktIn.toDF()))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_t").start()
    withQuery(q) {
      facIn.addData(
        facJson("BET", "2025-10-15T10:06:00+11:00", 95.0, 80.0),
        facJson("ALP", "2025-10-15T10:06:00+11:00", 10.0, 1.0))
      // Market data for VIC1 in the same 5-min bucket; none for NSW1.
      mktIn.addData(mktJson("VIC1", "2025-10-15T10:08:00+11:00", 92.1, 5000.0))
      q.processAllAvailable()
      val rows = spark.table("ssj_t")
        .select($"facility_id", $"price_dmwh").as[(String, Double)].collect()
      assert(rows.toSeq == Seq(("BET", 92.1))) // ALP has no market match
    }
  }

  test("dim refresh between batches: a miss enriches after the dim grows (§7.4.7)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("refresh").toString
    // The "database" the dim is re-read from each batch.
    @volatile var dimRows = Seq(("ALP", "NSW1"))
    val in = MemoryStream[String]
    val q = Ingest.enrichWithRefresh(
      Ingest.facilityEvents(in.toDF()),
      () => dimRows.toDF("facility_id", "region"),
      dir)
    withQuery(q) {
      in.addData(facJson("NEW", "2025-10-15T10:05:00+11:00", 5.0, 1.0))
      q.processAllAvailable()
      val missed = spark.read.parquet(s"$dir/misses/batch_0")
        .select($"facility_id").as[String].collect()
      assert(missed.toSeq == Seq("NEW")) // unknown facility → side channel
      // The upsert job lands NEW in the dim; the NEXT batch enriches it.
      dimRows = dimRows :+ (("NEW", "VIC1"))
      in.addData(facJson("NEW", "2025-10-15T10:10:00+11:00", 6.0, 1.1))
      q.processAllAvailable()
      val enriched = spark.read.parquet(s"$dir/enriched/batch_1")
        .select($"facility_id", $"region").as[(String, String)].collect()
      assert(enriched.toSeq == Seq(("NEW", "VIC1")))
    }
  }

  test("checkpoint recovery: latest-per-key state survives a query restart (T7)") {
    implicit val sqlCtx = spark.sqlContext
    // Memory sink can't recover from a checkpoint; the foreachBatch
    // parquet log (the fault-tolerant sink) is the right vehicle.
    val dir = java.nio.file.Files.createTempDirectory("ckpt").toString
    val in = MemoryStream[String]
    def start() = graft.sources.Sinks.parquetBatchLog(
      State.latestPerFacility(Ingest.facilityEvents(in.toDF())),
      dir, "ckpt_t", outputMode = "update")

    val q1 = start()
    in.addData(facJson("ALP", "2025-10-15T10:05:00+11:00", 10.0, 1.0))
    q1.processAllAvailable()
    q1.stop() // crash/redeploy boundary

    val q2 = start()
    withQuery(q2) {
      in.addData(facJson("ALP", "2025-10-15T10:00:00+11:00", 99.0, 9.0)) // older
      q2.processAllAvailable()
      val state = graft.sources.Sinks.readBatchLog(spark, dir)
        .groupBy($"facility_id")
        .agg(max_by(struct($"timestamp", $"power_mw"),
          struct(to_timestamp($"timestamp"), $"timestamp")).as("l"))
        .select($"facility_id", $"l.*").as[(String, String, Double)].collect()
        .map { case (k, ts, p) => k -> ((ts, p)) }.toMap
      // Pre-restart state won: the older event did not regress it.
      assert(state("ALP") == (("2025-10-15T10:05:00+11:00", 10.0)))
    }
  }

  test("RocksDB state store: watermarked windows emit identically to the default provider (T2/T3)") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDB {
      val in = MemoryStream[String]
      val totals = State.windowedTotals(
        Ingest.facilityEvents(in.toDF()), watermark = "10 minutes")
      val q = totals.writeStream.outputMode("append")
        .format("memory").queryName("totals_rocks").start()
      withQuery(q) {
        in.addData(
          facJson("ALP", "2025-10-15T10:05:00+11:00", 10.0, 1.0),
          facJson("BET", "2025-10-15T10:07:00+11:00", 5.0, 2.0))
        q.processAllAvailable()
        in.addData(facJson("ALP", "2025-10-15T10:30:00+11:00", 7.0, 0.5))
        q.processAllAvailable()
        in.addData(facJson("ALP", "2025-10-15T10:06:00+11:00", 1000.0, 999.0)) // too late
        in.addData(facJson("ALP", "2025-10-15T10:45:00+11:00", 3.0, 0.1))
        q.processAllAvailable()
        val emitted = spark.table("totals_rocks")
          .select($"bucket_start".cast("string"), $"total_power_mw").as[(String, Double)]
          .collect().toMap
        // Same assertions as the default-provider test: provider choice
        // must not change window emission or late-row semantics.
        assert(emitted("2025-10-14 23:05:00") == 15.0)
        assert(!emitted.values.exists(_ >= 1000.0))
      }
    }
  }

  test("RocksDB state store: latest-per-key checkpoint recovery survives a restart (T7)") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDB {
      val dir = java.nio.file.Files.createTempDirectory("ckpt_rocks").toString
      val in = MemoryStream[String]
      def start() = graft.sources.Sinks.parquetBatchLog(
        State.latestPerFacility(Ingest.facilityEvents(in.toDF())),
        dir, "ckpt_rocks_t", outputMode = "update")

      val q1 = start()
      in.addData(facJson("ALP", "2025-10-15T10:05:00+11:00", 10.0, 1.0))
      q1.processAllAvailable()
      q1.stop() // crash/redeploy boundary — RocksDB snapshot must reload

      val q2 = start()
      withQuery(q2) {
        in.addData(facJson("ALP", "2025-10-15T10:00:00+11:00", 99.0, 9.0)) // older
        q2.processAllAvailable()
        val state = graft.sources.Sinks.readBatchLog(spark, dir)
          .groupBy($"facility_id")
          .agg(max_by(struct($"timestamp", $"power_mw"),
            struct(to_timestamp($"timestamp"), $"timestamp")).as("l"))
          .select($"facility_id", $"l.*").as[(String, String, Double)].collect()
          .map { case (k, ts, p) => k -> ((ts, p)) }.toMap
        assert(state("ALP") == (("2025-10-15T10:05:00+11:00", 10.0)))
      }
    }
  }

  test("rejects channel on a stream: malformed rows flow to the dead letter, stream survives (T8)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val q = Ingest.rejects(in.toDF()).writeStream.outputMode("append")
      .format("memory").queryName("rejects_t").start()
    withQuery(q) {
      in.addData(
        facJson("ALP", "2025-10-15T10:05:00+11:00", 1.0, 0.0), // valid → not rejected
        """{"timestamp":"starting...","price_dmwh":0,"demand_mw":0}""",
        "%%% not json %%%")
      q.processAllAvailable()
      val rejected = spark.table("rejects_t").as[(String, String)].collect()
      assert(rejected.length == 2)
      assert(rejected.forall(_._2 == "reject"))
    }
  }

  test("streaming record linkage: deletion-key blocking against a static " +
    "registry, exactly one emission per match, stateless (q62 stream)") {
    implicit val sqlCtx = spark.sqlContext
    // Registry with known distance structure, including an exact twin
    // (ids 1 and 6 share "alpha") and multi-shared-key neighbors.
    val registry = Seq(
      1L -> "alpha", 2L -> "alpa", 3L -> "beta",
      4L -> "betta", 5L -> "gamma", 6L -> "alpha").toDF("k", "name")
    val in = MemoryStream[(Long, String)]
    val out = graft.ops.FuzzyJoin.linkStream(
      in.toDF().toDF("k", "name"), registry)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("fuzzy_link_t").start()
    withQuery(q) {
      in.addData(101L -> "alpha", 102L -> "betta")
      q.processAllAvailable()
      in.addData(103L -> "gama", 104L -> "zzzz", 105L -> null)
      q.processAllAvailable()
      val got = spark.table("fuzzy_link_t")
        .as[(Long, Long, Long)].collect().toSeq
      // Exactly once per (arrival, registry entity): identical names
      // share EVERY deletion key ("alpha"/"alpha" share 6), so a naive
      // blocking join would emit each such match 6x — the
      // min-shared-key rule must collapse them without state.
      assert(got.size == got.distinct.size,
        s"duplicate emissions: ${got.groupBy(identity).filter(_._2.size > 1).keys}")
      val expect = Set(
        (101L, 1L, 0L), (101L, 6L, 0L), (101L, 2L, 1L), // alpha: twins + 1-del
        (102L, 4L, 0L), (102L, 3L, 1L),                 // betta: exact + 1-del
        (103L, 5L, 1L))                                 // gama -> gamma
      assert(got.toSet == expect, s"got ${got.toSet}")
      // Stateless: no state operator rows (the dedup is algebraic, not
      // a streaming distinct — watermark-unbounded pair state is
      // exactly what this operator exists to avoid).
      val lastProg = q.recentProgress.reverse.find(_.numInputRows > 0)
      assert(lastProg.forall(_.stateOperators.forall(_.numRowsTotal == 0)))
    }
  }

  test("linkStream registry refresh: a registry row added out-of-band between " +
    "micro-batches is matched by later batches only (the enrichment-dim contract)") {
    implicit val sqlCtx = spark.sqlContext
    // The registry lives in a mutable store (embedded Derby, the J8/S10
    // test database): the static side's relation re-executes per
    // micro-batch, so an upsert job's insert is visible to the NEXT
    // batch without restarting the stream — the claim at the top of
    // linkStream's scaladoc, previously asserted nowhere.
    val url = "jdbc:derby:memory:linkreg;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        "CREATE TABLE reg (k BIGINT NOT NULL, name VARCHAR(100), PRIMARY KEY (k))")
      conn.createStatement().execute("INSERT INTO reg VALUES (1, 'alpha')")
      val raw = spark.read.format("jdbc")
        .option("url", url).option("dbtable", "reg").load()
      val registry = raw.toDF(raw.columns.toIndexedSeq.map(_.toLowerCase): _*)
      val in = MemoryStream[(Long, String)]
      val out = graft.ops.FuzzyJoin.linkStream(in.toDF().toDF("k", "name"), registry)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("fuzzy_link_refresh_t").start()
      withQuery(q) {
        in.addData(101L -> "alpha", 102L -> "betta")
        q.processAllAvailable()
        val batch1 = spark.table("fuzzy_link_refresh_t")
          .as[(Long, Long, Long)].collect().toSet
        assert(batch1 == Set((101L, 1L, 0L)),
          s"pre-refresh registry should only know alpha: $batch1")
        // Out-of-band refresh between micro-batches.
        conn.createStatement().execute("INSERT INTO reg VALUES (7, 'beta')")
        in.addData(103L -> "betta", 104L -> "alpha")
        q.processAllAvailable()
        val all = spark.table("fuzzy_link_refresh_t")
          .as[(Long, Long, Long)].collect().toSeq
        assert(all.size == all.distinct.size, s"duplicate emissions: $all")
        // 103 sees the refreshed registry; 102's batch-1 miss is NOT
        // retro-matched (append mode — each batch joins the snapshot
        // current at ITS trigger).
        assert(all.toSet == Set(
          (101L, 1L, 0L), (103L, 7L, 1L), (104L, 1L, 0L)), s"got ${all.toSet}")
      }
    } finally conn.close()
  }

  test("linkStream + dropDuplicatesWithinWatermark(k, reg_k): at-least-once " +
    "re-arrivals collapse to exactly-once pairs (the scaladoc recipe)") {
    implicit val sqlCtx = spark.sqlContext
    val registry = Seq(1L -> "alpha", 2L -> "alpa").toDF("k", "name")
    // Arrival payload (ts) must survive linkStream for the recipe to
    // compose — dropDuplicatesWithinWatermark requires the watermarked
    // event-time column still present on the frame it deduplicates.
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val arrivals = in.toDF().toDF("k", "name", "ts")
      .withWatermark("ts", "10 minutes")
    val out = graft.ops.FuzzyJoin.linkStream(arrivals, registry)
      .dropDuplicatesWithinWatermark("k", "reg_k")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("fuzzy_link_once_t").start()
    withQuery(q) {
      val t0 = java.sql.Timestamp.valueOf("2025-10-15 10:00:00")
      val t1 = java.sql.Timestamp.valueOf("2025-10-15 10:00:05")
      in.addData((101L, "alpha", t0))
      q.processAllAvailable()
      // The same record re-delivered (at-least-once source, retried
      // batch) inside the watermark horizon: matches re-derive
      // identically and must be suppressed, not re-emitted.
      in.addData((101L, "alpha", t1))
      q.processAllAvailable()
      val got = spark.table("fuzzy_link_once_t")
        .select("k", "reg_k", "dist")
        .as[(Long, Long, Long)].collect().toSeq
      assert(got.size == got.distinct.size,
        s"re-arrival re-emitted a pair: $got")
      assert(got.toSet == Set((101L, 1L, 0L), (101L, 2L, 1L)), s"got ${got.toSet}")
      // The dedup state is bounded by (k, reg_k) keys under the
      // watermark TTL — 2 emitted pairs -> 2 state rows, not per-arrival
      // growth.
      val lastProg = q.recentProgress.reverse.find(_.numInputRows > 0)
      assert(lastProg.exists(_.stateOperators.exists(_.numRowsTotal == 2)),
        s"state rows: ${lastProg.map(_.stateOperators.map(_.numRowsTotal).toSeq)}")
    }
  }
}

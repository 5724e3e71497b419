package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sources.{CsvCache, Replay, Sinks}

class SourcesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  test("facility lookup CSV round trip preserves the array column (S5/S6/P19)") {
    val dim = Seq(
      ("ALP", "Alpha", -33.1, 151.2, "NSW1", Seq("Solar (Utility)")),
      ("BET", "Beta", -37.8, 144.9, "VIC1", Seq("Battery (Discharging)", "Coal (Black)")))
      .toDF("facility_id", "facility_name", "lat", "lon", "region", "fuel_tech")
    val path = Files.createTempDirectory("lookup_csv").toString
    CsvCache.writeLookup(dim, path)
    val back = CsvCache.readLookup(spark, path)
    assert(back.schema("fuel_tech").dataType.typeName == "array")
    assert(back.exceptAll(dim).count() == 0 && dim.exceptAll(back).count() == 0)
  }

  test("wide cache CSV round trip: header-derived schema, nulls survive (S5/S6/P7)") {
    val wide = Seq(
      ("2025-10-15T10:05:00+11:00", Some(10.0), Some(0.5), Some(85.5)),
      ("2025-10-15T10:10:00+11:00", Some(12.0), None, None))
      .toDF("timestamp", "power_ALP", "emission_ALP", "price_NSW1")
    val path = Files.createTempDirectory("wide_csv").toString
    CsvCache.writeWide(wide, path)
    val back = CsvCache.readWide(spark, path)
    assert(back.schema.fields.map(f => f.name -> f.dataType.typeName).toMap ==
      Map("timestamp" -> "string", "power_ALP" -> "double",
        "emission_ALP" -> "double", "price_NSW1" -> "double"))
    assert(back.exceptAll(wide).count() == 0 && wide.exceptAll(back).count() == 0)
  }

  test("replay: indexing follows timestamp order; stream cycles with wrap epoch (S11/T7)") {
    val events = Seq(
      ("2025-10-15T10:10:00+11:00", "b"), ("2025-10-15T10:05:00+11:00", "a"),
      ("2025-10-15T10:15:00+11:00", "c"))
      .toDF("timestamp", "id")
    val idx = Replay.indexed(events, Seq("timestamp", "id"))
    assert(idx.orderBy("replay_idx").select("id").as[String].collect().toSeq ==
      Seq("a", "b", "c"))

    val stream = Replay.stream(spark, idx, nRows = 3, eventsPerSecond = 100)
    assert(stream.isStreaming)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("replay_t").start()
    try {
      // Rate source is wall-clock driven: give it a moment, then check
      // whatever arrived (ordering property, not exact counts).
      val deadline = System.currentTimeMillis() + 15000
      while (spark.table("replay_t").count() < 7 &&
        System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(200)
      }
      val got = spark.table("replay_t")
        .orderBy("value").select($"value", $"cycle", $"id").collect()
      assert(got.length >= 7, s"only ${got.length} replayed events arrived")
      // tick k replays event k % 3 and cycle k / 3 — the wrap is explicit.
      got.foreach { r =>
        val v = r.getLong(0)
        assert(r.getLong(1) == v / 3)
        assert(r.getString(2) == Seq("a", "b", "c")((v % 3).toInt))
      }
    } finally q.stop()
  }

  test("DSv2 batched-json source: one partition per staged batch file (S1/S2/S7)") {
    val dir = Files.createTempDirectory("batches")
    def facLine(id: String, p: Double) =
      s"""{"facility_id":"$id","timestamp":"2025-10-15T10:05:00+11:00","power_mw":$p,"co2_tonnes":0.0}"""
    Files.writeString(dir.resolve("batch_00.json"), s"${facLine("ALP", 1.0)}\n${facLine("BET", 2.0)}\n")
    Files.writeString(dir.resolve("batch_01.json"), s"${facLine("GMA", 3.0)}\n")
    Files.writeString(dir.resolve("batch_02.json"), s"${facLine("DLT", 4.0)}\n")
    Files.writeString(dir.resolve("ignored.txt"), "not a batch\n")

    val df = spark.read.format("batched-json").load(dir.toString)
    assert(df.schema.fieldNames.toSeq == Seq("batch_id", "value"))
    assert(df.rdd.getNumPartitions == 3) // partition == API batch
    assert(df.count() == 4)
    assert(df.filter($"batch_id" === 1).count() == 1)
    // The connector stays transport-only: the engine's ingest path decodes.
    val events = graft.stream.Ingest.facilityEvents(df.select($"value"))
    assert(events.select($"facility_id").as[String].collect().sorted.toSeq ==
      Seq("ALP", "BET", "DLT", "GMA"))
  }

  test("DSv2 source orders unpadded batch files numerically (batch_2 < batch_10)") {
    val dir = Files.createTempDirectory("batches_unpadded")
    for (i <- 0 to 10)
      Files.writeString(dir.resolve(s"batch_$i.json"), s"""{"n":$i}\n""")
    val df = spark.read.format("batched-json").load(dir.toString)
    val byBatch = df
      .select($"batch_id", get_json_object($"value", "$.n").cast("int").as("n"))
      .as[(Long, Int)].collect().toMap
    // batch_id i must contain file batch_i's row, not the lexicographic i-th.
    (0 to 10).foreach(i => assert(byBatch(i) == i, s"batch $i got ${byBatch(i)}"))
  }

  test("DSv2 source: epoch-millis batch numbers survive as Long; unnumbered files get disjoint ids") {
    val dir = Files.createTempDirectory("batches_mixed")
    Files.writeString(dir.resolve("batch_1760485500000.json"), """{"n":1}""" + "\n")
    Files.writeString(dir.resolve("unnumbered.json"), """{"n":2}""" + "\n")
    val df = spark.read.format("batched-json").load(dir.toString)
    val ids = df.select($"batch_id").as[Long].collect().sorted.toSeq
    // The parsed epoch-millis id is preserved (no Int wrap) and the
    // unnumbered file's fallback id is negative — disjoint by construction.
    assert(ids.contains(1760485500000L), s"ids were $ids")
    assert(ids.count(_ < 0) == 1, s"ids were $ids")
  }

  test("DSv2 reader retries a flaky batch fetch and succeeds (S3)") {
    val dir = Files.createTempDirectory("batches_flaky")
    Files.writeString(dir.resolve("batch_0.json"), """{"n":0}""" + "\n")
    val df = spark.read.format("batched-json")
      .option("injectFailures", 2) // fail twice, then succeed
      .option("maxAttempts", 3)
      .option("retryDelayMs", 1)
      .load(dir.toString)
    assert(df.count() == 1) // 3rd attempt lands inside the attempt budget
    // A second read of the same flaky directory gets its own injection
    // scope — the failures (and the retry path) happen again, instead of
    // the first read's exhausted counter silently disabling them.
    val again = spark.read.format("batched-json")
      .option("injectFailures", 2)
      .option("maxAttempts", 2) // budget one short of the failures
      .option("retryDelayMs", 1)
      .load(dir.toString)
    intercept[Exception](again.count())
  }

  test("DSv2 reader gives up after maxAttempts on a persistently failing batch (S3)") {
    val dir = Files.createTempDirectory("batches_dead")
    Files.writeString(dir.resolve("batch_0.json"), """{"n":0}""" + "\n")
    val df = spark.read.format("batched-json")
      .option("injectFailures", 99)
      .option("maxAttempts", 3)
      .option("retryDelayMs", 1)
      .load(dir.toString)
    val e = intercept[Exception](df.count())
    // The terminal error names the attempt budget, wrapping the last cause.
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => Option(t.getMessage).exists(_.contains("after 3 attempts"))))
  }

  test("JDBC lookup-miss fallback: miss → registry upsert → next batch enriches (S10/J8)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.JdbcLookup
    // Embedded Derby stands in for the reference's PostgreSQL: same JDBC
    // surface, runs offline. Quoted lowercase column names (Derby folds
    // unquoted ones to upper); unquoted table names so Spark's plain
    // INSERT INTO facility_lookup resolves.
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.executeUpdate("""CREATE TABLE facility_lookup ("facility_id" VARCHAR(16) NOT NULL PRIMARY KEY, "facility_name" VARCHAR(64), "region" VARCHAR(8), "lat" DOUBLE, "lon" DOUBLE, "fuel_tech" VARCHAR(32))""")
    st.executeUpdate("""CREATE TABLE ner_facility ("facility_id" VARCHAR(16), "facility_name" VARCHAR(64), "fuel_type_id" VARCHAR(32), "location_id" INT)""")
    st.executeUpdate("""CREATE TABLE ner_location ("location_id" INT, "lat" DOUBLE, "lon" DOUBLE, "region" VARCHAR(8))""")
    st.executeUpdate("INSERT INTO facility_lookup VALUES ('ALP', 'Alpha', 'NSW1', -33.1, 151.2, 'solar_utility')")
    // BET exists upstream (registry ⋈ location) but not in the lookup;
    // GMA exists nowhere — the stays-dead-lettered path.
    st.executeUpdate("INSERT INTO ner_facility VALUES ('BET', 'Beta', 'coal_black', 7)")
    st.executeUpdate("INSERT INTO ner_location VALUES (7, -37.8, 144.9, 'VIC1')")
    st.close(); conn.close()

    def facJson(id: String, ts: String) =
      s"""{"facility_id":"$id","timestamp":"$ts","power_mw":1.0,"co2_tonnes":0.0}"""
    val in = MemoryStream[String]
    val dir = Files.createTempDirectory("jdbc_enrich").toString
    val q = graft.stream.Ingest.enrichWithJdbcLookup(
      graft.stream.Ingest.facilityEvents(in.toDF()), url, dir)
    try {
      in.addData(facJson("BET", "2025-10-15T10:05:00+11:00"),
        facJson("GMA", "2025-10-15T10:05:00+11:00"))
      q.processAllAvailable()
      val missed0 = spark.read.parquet(s"$dir/misses/batch_0")
        .select($"facility_id").as[String].collect().toSet
      assert(missed0 == Set("BET", "GMA"))
      // The in-batch resolution landed BET in the Derby lookup; the NEXT
      // batch's snapshot enriches it. GMA stays a miss (unknown upstream).
      in.addData(facJson("BET", "2025-10-15T10:10:00+11:00"),
        facJson("GMA", "2025-10-15T10:10:00+11:00"))
      q.processAllAvailable()
      val enriched1 = spark.read.parquet(s"$dir/enriched/batch_1")
        .select($"facility_id", $"region", $"fuel_tech")
        .as[(String, String, String)].collect().toSet
      assert(enriched1 == Set(("BET", "VIC1", "coal_black")))
      val missed1 = spark.read.parquet(s"$dir/misses/batch_1")
        .select($"facility_id").as[String].collect().toSet
      assert(missed1 == Set("GMA"))
    } finally q.stop()
    // Idempotency: re-resolving an id that is now present inserts nothing
    // (the DO-NOTHING half of the reference's ON CONFLICT upsert).
    assert(JdbcLookup.resolveMisses(spark, url,
      Seq("BET").toDF("facility_id")) == 0L)
    assert(JdbcLookup.readLookup(spark, url)
      .filter($"facility_id" === "BET").count() == 1L)
  }

  test("foreachBatch sink: idempotent per-batch parquet log (S8)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val dir = Files.createTempDirectory("batch_log").toString
    val q = Sinks.parquetBatchLog(in.toDF(), dir, "sink_t")
    try {
      in.addData("e1", "e2")
      q.processAllAvailable()
      in.addData("e3")
      q.processAllAvailable()
      val back = Sinks.readBatchLog(spark, dir).as[String].collect().sorted
      assert(back.toSeq == Seq("e1", "e2", "e3"))
    } finally q.stop()
  }
}

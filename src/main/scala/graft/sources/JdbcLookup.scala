package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JDBC leg of the lookup-miss fallback (ref S10/J8,
  * dashboard.py:277-307): the reference keeps its facility lookup in an
  * operational database; an event for an unknown facility triggers a
  * SELECT against the upstream registry (`ner.facility ⋈ ner.location`)
  * and an idempotent `INSERT … ON CONFLICT DO NOTHING` into
  * `oem.facility_lookup`, so the *next* event for that facility
  * enriches.
  *
  * Spark-first shape:
  *   - the lookup dim is a `spark.read.jdbc` snapshot per micro-batch
  *     (a dim re-read is cheap; state never mutates inside a running
  *     query — SURVEY §7.4.7);
  *   - miss resolution collects the batch's distinct missing ids (small
  *     by construction: unknown facilities per batch, not events) and
  *     pushes them as an `IN` predicate into the registry read — the
  *     set-based form of the reference's per-id SELECT;
  *   - "ON CONFLICT DO NOTHING" is an anti-join against current lookup
  *     keys followed by an append, under a PRIMARY KEY constraint that
  *     backstops the race window (a concurrent duplicate insert fails
  *     the batch rather than corrupting the table).
  *
  * The database is anything with a JDBC driver on the classpath; tests
  * use embedded Derby (`jdbc:derby:memory:…`) from `/opt/spark/jars`.
  */
object JdbcLookup {

  val LookupTable = "facility_lookup"
  val RegistryFacilityTable = "ner_facility"
  val RegistryLocationTable = "ner_location"

  private def read(spark: SparkSession, url: String, table: String): DataFrame = {
    val df = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).load()
    // Normalize case: databases that fold unquoted identifiers (Derby →
    // upper) would otherwise leak fold-case column names into the plan.
    df.toDF(df.columns.toIndexedSeq.map(_.toLowerCase): _*)
  }

  /** Current lookup snapshot — call once per micro-batch (J8). */
  def readLookup(spark: SparkSession, url: String): DataFrame =
    read(spark, url, LookupTable)

  /** Hard ceiling on distinct miss ids resolved per batch. A healthy
    * batch has a handful of unknown facilities; hitting this means the
    * batch is poisoned or misrouted (every event carrying a distinct
    * bogus id), and an unbounded collect + IN-list would risk driver
    * memory and an oversized JDBC statement. Failing the batch loudly is
    * the safe behavior — the stream's dead-letter channel is where
    * systematically-unresolvable events belong.
    */
  val MaxMissesPerBatch = 10000

  /** Resolve this batch's misses against the upstream registry and
    * append the found facilities to the lookup, idempotently. Returns
    * the number of rows inserted (0 when every miss is unknown upstream
    * too — those stay on the dead-letter side channel, exactly the
    * reference's not-in-NGER path).
    */
  def resolveMisses(spark: SparkSession, url: String, misses: DataFrame): Long = {
    // Bounded driver collect: distinct unknown facility ids of ONE batch,
    // null-free (a null id can't be looked up and would NPE the map),
    // limit-capped so even the probe collect is bounded.
    val ids = misses.select(col("facility_id"))
      .filter(col("facility_id").isNotNull)
      .distinct().limit(MaxMissesPerBatch + 1)
      .collect().map(_.getString(0)).toSeq
    if (ids.size > MaxMissesPerBatch)
      throw new IllegalStateException(
        s"resolveMisses: > $MaxMissesPerBatch distinct unknown facility ids " +
          "in one batch — refusing the unbounded lookup (poisoned batch?)")
    if (ids.isEmpty) return 0L
    // SELECT f.name, f.fuel_type_id, l.lat/lon/region FROM facility ⋈
    // location WHERE facility_id IN (…) — the IN filter pushes into the
    // JDBC scan (dashboard.py:281-288).
    val found = read(spark, url, RegistryFacilityTable)
      .join(read(spark, url, RegistryLocationTable), Seq("location_id"))
      .filter(col("facility_id").isin(ids.map(x => x: Any): _*))
      .select(col("facility_id"), col("facility_name"), col("region"),
        col("lat"), col("lon"), col("fuel_type_id").as("fuel_tech"))
    // DO-NOTHING upsert: only ids not already present are appended. The
    // resolved rows are collected ONCE (bounded like `ids`) and written
    // from the driver's copy — counting and then re-executing the plan
    // would read the live lookup twice and could insert a different set
    // than it reported under concurrent writers.
    val fresh = found.join(readLookup(spark, url).select(col("facility_id")),
        Seq("facility_id"), "left_anti")
      .collect()
    if (fresh.nonEmpty)
      spark.createDataFrame(
          java.util.Arrays.asList(fresh: _*),
          found.schema)
        .write.format("jdbc")
        .option("url", url).option("dbtable", LookupTable)
        .mode("append").save()
    fresh.length.toLong
  }
}

package graft.sources

import java.io.IOException
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's batched-fetch pattern
  * (ref S1/S2: extractor.py:98-166 — 17 batches × 25 facility codes,
  * fetched serially in Python; here each batch is an `InputPartition`, so
  * a 1000-executor cluster fetches all batches concurrently).
  *
  * The "API" is modeled as a directory of staged per-batch JSON files
  * (exactly what the reference's `data/power_emissions/` staging is,
  * S7). Each file becomes one partition; rows are `(batch_id, value)`
  * with the raw JSON line in `value` — decode stays in the engine via
  * `from_json` (the Ingest path), keeping the connector transport-only
  * the way a Kafka source is.
  *
  * Retry/pacing (ref S3: extractor.py:116-136 — ≤3 attempts, fixed delay)
  * lives in the partition reader: the per-batch fetch is retried up to
  * `maxAttempts` times with `retryDelayMs` between attempts, so a
  * transient transport failure costs one partition a bounded delay, not
  * the job. Tune via read options `maxAttempts` / `retryDelayMs`; the
  * `injectFailures` option makes the first N fetch attempts of every
  * partition throw (deterministic fault injection for tests — a real
  * HTTP transport would surface real IOExceptions in the same place).
  *
  * Usage: `spark.read.format("batched-json").load(dir)`.
  */
class BatchedJsonSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "batched-json"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BatchedJsonSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new BatchedJsonTable(opts.get("path"),
      RetryConf(
        maxAttempts = opts.getInt("maxAttempts", 3),
        delayMs = opts.getLong("retryDelayMs", 10000L),
        injectFailures = opts.getInt("injectFailures", 0),
        // Fresh injection scope per read: without it a second read of
        // the same file in one JVM would find the counter exhausted and
        // silently skip the failures it was asked to inject.
        scanId = java.util.UUID.randomUUID().toString))
  }
}

object BatchedJsonSource {
  // batch_id is Long: filename numbers can be epoch millis (or anything a
  // staging job stamps), which overflow Int.
  val schema: StructType = StructType(Seq(
    StructField("batch_id", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** Injected-failure counts per (scan, file) — the scan id scopes
    * injection to one `.load()`, so repeated reads each see their full
    * failure budget (per-JVM map: the scope of a local test run).
    */
  private[sources] val injectedFailures = new ConcurrentHashMap[String, Integer]()
}

private case class RetryConf(maxAttempts: Int, delayMs: Long,
    injectFailures: Int, scanId: String = "")

private class BatchedJsonTable(path: String, retry: RetryConf)
    extends Table with SupportsRead {
  override def name(): String = s"batched-json:$path"
  override def schema(): StructType = BatchedJsonSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = BatchedJsonSource.schema
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        val dir = Paths.get(path)
        val listing = Files.list(dir)
        val files = try {
          listing.iterator().asScala
            .filter(_.toString.endsWith(".json")).toArray
        } finally listing.close()
        // Natural-numeric order: `batch_2` before `batch_10` even without
        // zero padding. batch_id is the number parsed from the filename
        // (so staging that starts at batch_1 or has gaps keeps its ids);
        // unnumbered files get -(sortIndex + 1) — negative, hence disjoint
        // from any parsed `\d+` id, so a mixed directory can't collide.
        val numbered = files.map { f =>
          val name = f.getFileName.toString
          val num = "\\d+".r.findFirstIn(name).map(_.toLong)
          (num, name, f)
        }.sortBy { case (num, name, _) => (num.getOrElse(Long.MaxValue), name) }
        numbered.zipWithIndex.map { case ((num, _, f), i) =>
          BatchPartition(num.getOrElse(-(i + 1L)), f.toString): InputPartition
        }
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new BatchReaderFactory(retry)
    }
}

private case class BatchPartition(batchId: Long, file: String) extends InputPartition

private class BatchReaderFactory(retry: RetryConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BatchPartition]
    new PartitionReader[InternalRow] {
      // One batch file is one API response (≤25 entities in the
      // reference) — reading it eagerly per partition is the contract.
      private val lines = fetchWithRetry()
        .iterator.filter(_.nonEmpty)
      private var current: String = _

      private def fetchWithRetry(): Seq[String] = {
        var attempt = 1
        while (true) {
          try return fetchOnce()
          catch {
            case _: IOException if attempt < retry.maxAttempts =>
              attempt += 1
              Thread.sleep(retry.delayMs)
            case e: IOException =>
              throw new IOException(
                s"batch fetch failed after ${retry.maxAttempts} attempts: ${p.file}", e)
          }
        }
        throw new IllegalStateException("unreachable")
      }

      private def fetchOnce(): Seq[String] = {
        if (retry.injectFailures > 0) {
          // Fail-open size cap: counters must outlive the read (they
          // suppress re-injection on later actions of the same scan),
          // and evicting OTHER scans' entries would re-arm injection on
          // concurrently-active scans mid-query — so nothing is ever
          // removed; instead, once the map is at capacity, NEW
          // (scan, file) pairs simply stop injecting. Bounded memory; a
          // JVM past 4096 injection pairs is a test harness that has
          // long since exercised its failure paths.
          val m = BatchedJsonSource.injectedFailures
          val key = s"${retry.scanId}:${p.file}"
          if (m.containsKey(key) || m.size < 4096) {
            val n = m.merge(key, 1, (a, b) => a + b)
            if (n <= retry.injectFailures)
              throw new IOException(s"injected failure $n for ${p.file}")
          }
        }
        Files.readAllLines(Path.of(p.file), StandardCharsets.UTF_8).asScala.toSeq
      }

      override def next(): Boolean = {
        if (lines.hasNext) { current = lines.next(); true } else false
      }
      override def get(): InternalRow =
        InternalRow(p.batchId, UTF8String.fromString(current))
      // NOT evicted on close: the exhausted counter is what stops a
      // SECOND action on the same loaded DataFrame (same scanId) from
      // re-injecting its failure budget — removal here would re-arm it.
      // Unbounded growth is handled by the size cap in fetchOnce.
      override def close(): Unit = ()
    }
  }
}

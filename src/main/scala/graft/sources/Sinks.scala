package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming sinks (ref S8: publisher.py:22-42 MQTT publish).
  *
  * The reference publishes each event over MQTT QoS 1 (at-least-once);
  * the Spark-native sink boundary is `foreachBatch`: per micro-batch the
  * engine hands us a batch DataFrame + a monotonically increasing batch
  * id. Writing each batch to a batch-id-named location makes the sink
  * idempotent under retries — replays of a batch overwrite the same
  * location instead of duplicating (the exactly-once-effect pattern for
  * at-least-once transports).
  */
object Sinks {

  /** Partitioned parquet event log, one directory per micro-batch. */
  def parquetBatchLog(events: DataFrame, dir: String, queryName: String,
      outputMode: String = "append"): StreamingQuery =
    events.writeStream
      .outputMode(outputMode)
      .queryName(queryName)
      .option("checkpointLocation", s"$dir/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$dir/batch_$batchId")
      }
      .start()

  /** Read the whole batch log back as one DataFrame. */
  def readBatchLog(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/batch_*")
}

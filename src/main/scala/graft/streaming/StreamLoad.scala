package graft.streaming

import java.sql.Connection

import graft.sources.JdbcSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming leg of the warehouse load: `foreachBatch` → [[JdbcSink.load]]
  * — the continuous twin of the reference's daily COPY/INSERT
  * (`tweets.py:123-133`), closing extract → transform → LOAD for streams.
  *
  * Use APPEND-mode outputs (watermark-finalized windows, e.g.
  * [[EventStream.tumblingCounts]]): each window row is emitted exactly
  * once, so plain INSERTs stay duplicate-free. The checkpoint gives
  * at-least-once batch delivery; a re-delivered batch re-runs the same
  * `batchId`, so exactly-once sinks should key on (batchId, row) or load
  * into a staging table and MERGE — the hook receives the batchId for
  * exactly that purpose.
  */
object StreamLoad {

  /** Start loading a streaming DataFrame into `table`. `connect` runs on
    * executors per partition (see [[JdbcSink.load]]); `onBatch` is an
    * optional observer (metrics, idempotency bookkeeping) called after
    * each micro-batch commits.
    */
  def toJdbc(
      df: DataFrame, table: String,
      connect: () => Connection,
      checkpointDir: String,
      batchSize: Int = 500,
      onBatch: (Long, Long) => Unit = (_, _) => ()): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val n = batch.count()
        JdbcSink.load(batch, table, connect, batchSize)
        onBatch(batchId, n)
      }
      .start()
}

package graft.streaming

import graft.sources.PartitionedUpsert
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous CDC apply: a stream of keyed, versioned updates merged into
  * a partitioned parquet table, micro-batch by micro-batch — the live twin
  * of [[graft.sources.PartitionedUpsert]], the way a warehouse table keeps
  * tracking an operational feed (the reference reloads a whole execution
  * date per DAG run, `tweets.py:94-101`; this applies deltas as they
  * arrive, rewriting only the partitions each batch touches).
  *
  * Latest-version-wins makes re-application idempotent
  * (PartitionedUpsertSpec pins it), so the checkpoint's at-least-once
  * batch delivery yields an exactly-once TABLE STATE: a re-delivered
  * batch merges rows whose versions the table already carries and changes
  * nothing.
  */
object StreamUpsert {

  def start(
      updates: DataFrame, tablePath: String, keyCols: Seq[String],
      versionCol: String, partitionCol: String, checkpointDir: String,
      onBatch: (Long, Long) => Unit = (_, _) => ()): StreamingQuery =
    updates.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val n = batch.count()
        if (n > 0)
          PartitionedUpsert.upsertInto(
            batch.sparkSession, tablePath, batch, keyCols, versionCol, partitionCol)
        onBatch(batchId, n)
      }
      .start()
}

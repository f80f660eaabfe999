package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Shared K3-style append sinks. */
object Sinks {

  /** Micro-batched parquet append with REAL epoch idempotence: each
    * epoch overwrites its own `epoch=<id>` directory, so a retried
    * micro-batch (foreachBatch is at-least-once) replaces its previous
    * partial output instead of appending duplicates. Readers see the
    * epoch as a partition column via `spark.read.parquet(outDir)`.
    * For a JDBC target the body becomes a transactional upsert keyed
    * on (epochId, row) with `batchsize` (the reference's 128-row
    * transactions, `collector.clj:97-119`). */
  def appendParquet(df: DataFrame, outDir: String, checkpoint: String,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val w = df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/epoch=$epochId"): Unit
      }
    trigger.fold(w)(w.trigger).start()
  }
}

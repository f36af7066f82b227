package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.store.GridStore

/** Structured Streaming façade over the incremental update planner
  * (SURVEY §2.9): the reference is batch-incremental — each run
  * appends/inserts a delta — which maps 1:1 onto a file-source stream
  * driving `GridStore.publish` per micro-batch in `foreachBatch`.
  *
  * Late data (timestamps already in the store) become in-place inserts of
  * their time buckets; new timestamps append — exactly the semantics the
  * reference gates with `allow_overwrite` and cadence checks. Watermarking
  * is intentionally NOT applied before the store write: the store itself is
  * the stateful dedup (bucket overwrite is idempotent), so no streaming
  * state accumulates.
  */
object StreamingUpdate {

  /** Attach a streaming source (e.g. `spark.readStream.schema(s)
    * .parquet(dir)`) to a store. Each micro-batch runs the full classify →
    * insert/append protocol. */
  def attach(
      stream: DataFrame,
      store: GridStore,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) store.publish(batch)
      }
      .start()
}

package graft.store

import org.apache.spark.sql.DataFrame

/** The surface a streaming ingest needs from a store: publish one
  * micro-batch (insert/append classification happens inside the store's
  * own update machinery) and reopen the result. Implemented by the
  * parquet [[GridStore]] and the native-format [[ZarrStore]], so
  * `StreamingUpdate.attach` can land batches in either — the reference's
  * cron-batch loop always writes zarr (publish.py:86-129); the parquet
  * store is this engine's write-optimized alternative. */
trait GridPublisher {
  /** Publish one batch into the store (initial write if none exists). */
  def publishBatch(update: DataFrame): Unit

  /** Reopen the store's current contents. */
  def dataset(): DataFrame
}

package graft.store

/** W7 — chunk-alignment boundary math for appends
  * (utils/publish.py:1296-1338, docs/Aligning_update_chunks.md).
  *
  * In the Parquet store, correctness never depends on this (buckets are the
  * replacement unit); it exists for LAYOUT parity: sizing the row-count
  * splits of an append so the first file butt-joins the existing partial
  * tail instead of bridging two storage chunks.
  */
object ChunkLayout {

  /** Bespoke chunk run for an append: first chunk completes the existing
    * partial tail, then full chunks, then the remainder. Entries sum to
    * `appendTimeLength`. Mirrors `calculate_time_dim_chunks`
    * (publish.py:1296-1338): e.g. chunk size 5, existing tail 3, append 8 →
    * (2, 5, 1). */
  def calculateTimeDimChunks(
      oldFinalChunkLength: Int,
      timeDimChunkSize: Int,
      appendTimeLength: Int): Seq[Int] = {
    require(timeDimChunkSize > 0, "chunk size must be positive")
    require(oldFinalChunkLength >= 0 && oldFinalChunkLength <= timeDimChunkSize,
      s"existing tail $oldFinalChunkLength outside [0, $timeDimChunkSize]")
    require(appendTimeLength >= 0, "append length must be non-negative")
    val firstChunk = math.min(timeDimChunkSize - oldFinalChunkLength, appendTimeLength)
    val remaining = appendTimeLength - firstChunk
    val fullChunks = remaining / timeDimChunkSize
    val finalChunk = remaining % timeDimChunkSize
    (if (firstChunk > 0) Seq(firstChunk) else Seq.empty) ++
      Seq.fill(fullChunks)(timeDimChunkSize) ++
      (if (finalChunk > 0) Seq(finalChunk) else Seq.empty)
  }

  /** Cumulative split offsets for `repartitionByRange`-style boundaries:
    * (2,5,1) → (2,7,8). */
  def chunkOffsets(chunks: Seq[Int]): Seq[Int] =
    chunks.scanLeft(0)(_ + _).tail
}

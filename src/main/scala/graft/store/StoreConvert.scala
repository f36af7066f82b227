package graft.store

import graft.sources.zarr.ZarrCodec

/** Store-to-store conversion jobs: rechunking a zarr store (the standalone
  * `rechunker` tool's job — reference docs recommend it for layout changes,
  * e.g. docs/Aligning_update_chunks.md) and migrating between the parquet
  * [[GridStore]] and the native [[ZarrStore]] layouts.
  *
  * All three are ONE distributed job shaped like an initial publish: the
  * source side is the chunk-pruned store scan (only the columns and chunks
  * the write needs are read), the shuffle key is the DESTINATION chunk
  * (or shard) id, and each reduce task owns exactly one output object —
  * the same plan that writes a 100 TB store in the first place. There is
  * no driver-side staging and no per-chunk driver loop, which is what
  * makes the conversion safe at archive scale.
  */
object StoreConvert {

  /** Rechunk / recompress / re-format a zarr store into a NEW store at
    * `dstPath` with the target layout: different chunk lengths, codec,
    * metadata format (v2 sidecars ↔ v3 `zarr.json`), or v3
    * `sharding_indexed` shards. Values, axes, and null (fill) cells are
    * preserved bit-for-bit: the dense scan emits every coordinate, and
    * explicit nulls re-encode as fill in the destination.
    *
    * The work is one publish job: dst-chunk-keyed shuffle, one task per
    * output chunk/shard, source chunks read exactly once. */
  def rechunkZarr(src: ZarrStore, dstPath: String,
      timeChunk: Int = 128, spatialChunks: Option[Seq[Int]] = None,
      codec: ZarrCodec.Codec = ZarrCodec.ZlibCodec(1),
      zarrFormat: Int = 2,
      shardChunks: Option[Seq[Int]] = None,
      /** Encrypt the destination's data chunks (SHA3-256 key hash, see
        * [[ZarrStore]]). Independent of the source: rechunking can add,
        * keep (pass the same hash), rotate (pass a different registered
        * hash), or drop encryption. */
      encryptionKeyHash: Option[String] = None): ZarrStore = {
    val dst = new ZarrStore(src.spark, dstPath, src.desc, timeChunk,
      spatialChunks, codec, zarrFormat, shardChunks, encryptionKeyHash)
    require(!dst.hasExisting,
      s"rechunk target already holds a store: $dstPath (delete it first — " +
        "rechunking in place would read and clobber the same chunks)")
    dst.publish(src.dataset())
    dst
  }

  /** Migrate a parquet [[GridStore]] into a native zarr layout (e.g. to
    * hand a curated archive to xarray/zarr readers). `dst` carries the
    * target chunking/codec; values and nulls are preserved. */
  def parquetToZarr(src: GridStore, dst: ZarrStore): ZarrStore = {
    require(!dst.hasExisting,
      s"migration target already holds a store: ${dst.path}")
    dst.publish(src.dataset())
    dst
  }

  /** Migrate a native zarr store into the parquet [[GridStore]] layout
    * (bucketed, sorted, engine-queryable). Null cells — zarr fill — carry
    * over as null rows so a round-trip back to zarr re-fills them. */
  def zarrToParquet(src: ZarrStore, dst: GridStore): GridStore = {
    dst.publish(src.dataset())
    dst
  }
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travel as opaque `binary` columns with typed metadata;
  * decode / feature-extract / resize / frame-sample run batched per
  * partition.
  *
  * The actual codec step is STUBBED (this environment ships no image/audio
  * libraries): `StubDecoder` produces deterministic fake pixels from the
  * bytes. Everything around it — schema, partition batching, batch shape,
  * metadata extraction — is real Spark plumbing a production decoder drops
  * into unchanged (swap `decoder` for a JNI/javacpp-backed one).
  */
object Multimodal {

  /** Typed metadata schema carried alongside every media column. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("content_hash", LongType, nullable = false),
    StructField("format", StringType, nullable = true)))

  /** Magic-byte sniffing as a codegen'd expression — no UDF: the usual
    * image containers are recognizable from the first bytes. */
  def sniffFormat(binCol: Column): Column = {
    val head = hex(substring(binCol, 1, 4))
    when(head.startsWith("89504E47"), "png")
      .when(head.startsWith("FFD8FF"), "jpeg")
      .when(head.startsWith("47494638"), "gif")
      .when(head.startsWith("52494646"), "riff") // wav/webp family
      .otherwise(lit(null).cast(StringType))
  }

  /** Metadata struct (length, 64-bit content hash, sniffed format) as one
    * expression over the binary column. */
  def mediaMeta(binCol: Column): Column =
    struct(
      length(binCol).cast(LongType).as("byte_len"),
      xxhash64(binCol).as("content_hash"),
      sniffFormat(binCol).as("format"))

  /** Perceptual-hash-style fingerprint for exact/near media dedup without
    * decoding: xxhash of fixed-position byte windows folded simhash-style.
    * Pure expression — the binary never leaves the scan. */
  def mediaFingerprint(binCol: Column, windows: Int = 8): Column = {
    // Long arithmetic BEFORE multiplying: Int byte-lengths overflow at
    // w * ~300MB under ANSI mode.
    val n = length(binCol).cast(LongType)
    val hashes = (0 until windows).map { w =>
      // window w starts at floor(w * n / windows) (1-based substring)
      val start = (lit(w.toLong) * n) / lit(windows.toLong)
      xxhash64(lit(w), substring(binCol, (start + 1).cast(IntegerType), lit(64)))
    }
    hashes.reduce((a: Column, b: Column) => xxhash64(a, b))
  }

  /** One decoded record batch row. `pixels` is row-major grayscale. */
  final case class DecodedMedia(
      id: Long, width: Int, height: Int, pixels: Array[Float])

  /** Pluggable decoder: bytes → decoded record. */
  type Decoder = (Long, Array[Byte], Int, Int) => DecodedMedia

  /** STUB decode — deterministic fake pixels derived from the byte content
    * (xxhash-seeded), standing in for a real image codec. */
  val StubDecoder: Decoder = (id, bytes, w, h) => {
    val seed = java.util.Arrays.hashCode(bytes).toLong
    val px = Array.tabulate(w * h) { i =>
      // cheap splitmix-style mix — deterministic in (bytes, i)
      var z = seed + 0x9e3779b97f4a7c15L * (i + 1)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      ((z ^ (z >>> 31)) & 0xffffL).toFloat / 65535.0f
    }
    DecodedMedia(id, w, h, px)
  }

  /** Decode + resize to (w × h) feature grids, batched per partition — the
    * Scala analog of a `mapInPandas` decode stage: one decoder instance per
    * partition, rows streamed through it, output schema fixed and typed.
    * Input: (id, bytes). The binary column stays partition-local; only the
    * (much smaller) decoded features shuffle afterwards if at all. */
  def decodeResize(
      df: DataFrame,
      idCol: String,
      binCol: String,
      width: Int,
      height: Int,
      decoder: Decoder = StubDecoder): Dataset[DecodedMedia] = {
    val enc = Encoders.product[DecodedMedia]
    df.select(col(idCol).cast(LongType), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        // per-partition decoder lifecycle (expensive codec init done once)
        it.map { case (id, bytes) => decoder(id, bytes, width, height) }
      }(enc)
  }

  /** Mean-pool the decoded pixel grid into an embedding of `dim` — the
    * feature-extraction step after decode, done relationally so it stays
    * inside codegen. */
  def pooledEmbedding(decoded: Dataset[DecodedMedia], dim: Int): DataFrame = {
    decoded.toDF()
      .select(col("id"),
        transform(sequence(lit(0), lit(dim - 1)), b => {
          val n = size(col("pixels"))
          val start = (b * n) / lit(dim)
          val end = ((b + lit(1)) * n) / lit(dim)
          val sliced = slice(col("pixels"), start + 1, greatest(end - start, lit(1)))
          aggregate(sliced, lit(0.0), (acc, v) => acc + v) /
            greatest(size(sliced), lit(1)).cast(DoubleType)
        }).as("embedding"))
  }

  /** Frame sampling for video-like payloads: split the byte stream into
    * `frames` equal windows and emit (id, frame_idx, frame_bytes) — the
    * explode happens in the engine, not the driver. */
  def frameSample(df: DataFrame, idCol: String, binCol: String, frames: Int): DataFrame = {
    // cast to Long BEFORE the multiply: Int frame-index × Int byte-length
    // overflows for multi-hundred-MB payloads under ANSI mode
    val n = length(col(binCol)).cast(LongType)
    df.select(col(idCol), posexplode(transform(sequence(lit(0), lit(frames - 1)), f => {
        val start = f.cast(LongType) * n / lit(frames.toLong)
        val end = (f.cast(LongType) + lit(1L)) * n / lit(frames.toLong)
        substring(col(binCol), (start + 1).cast(IntegerType),
          greatest((end - start).cast(IntegerType), lit(1)))
      })))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")
  }

  /** Scan a directory of raw media files as (path, modificationTime, length,
    * content) — Spark's binaryFile source (the media ingestion path). */
  def scanBinaryFiles(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)
}

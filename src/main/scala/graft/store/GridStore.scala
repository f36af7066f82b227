package graft.store

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

import graft.model.{DatasetDescriptor, TimeSpan, TimeUnitKind}
import graft.ops.UpdatePlan

/** Incremental grid store on bucket-partitioned parquet — the Spark-native
  * re-expression of the reference's Zarr write engine
  * (gridded_etl_tools/utils/publish.py + store.py).
  *
  * Layout: one parquet dataset partitioned by a coarse time bucket column
  * (`__bucket`, e.g. one directory per month). The bucket is the unit of
  * in-place replacement: appends only create new bucket directories, inserts
  * dynamically overwrite only the touched buckets (publish.py:406-478), and
  * partition pruning keeps every read bounded. Within buckets rows are
  * sorted by the standard dims and split at `maxRecordsPerFile` — the
  * two-level dask-chunk / zarr-chunk sizing analog
  * (docs/etl_developers_manual.md:135-152).
  *
  * Scale notes (100 TB): all data paths are single `df.write` jobs — no
  * driver-side row handling. The only driver I/O is the attrs sidecar (a few
  * KB of JSON via the Hadoop FS API, so file:// and s3a:// behave alike).
  */
final class GridStore(
    val spark: SparkSession,
    val path: String,
    val desc: DatasetDescriptor,
    /** Bucket granularity; must be ≥ the dataset resolution. */
    val bucketSpan: TimeUnitKind = TimeUnitKind.Months,
    /** Storage-chunk analog: rows per parquet file within a bucket. */
    val maxRecordsPerFile: Long = 5000000L,
    /** W13 — compression codec (`use_compression` toggle + Blosc LZ4
      * default, metadata.py:939-959): any Spark parquet codec name, or
      * "none"/"uncompressed" to disable. */
    val compression: String = "lz4",
    /** W12, parquet-native: encrypt NEW stores with Parquet Modular
      * Encryption — footer + every data column keyed under the registered
      * master key named by this SHA3-256 hash (see
      * [[graft.functions.Encryption.registerEncryptionKey]]), wrapped
      * through [[GraftKmsClient]]. The hash is persisted in the attrs
      * sidecar, so reopening for reads or updates only needs the key
      * REGISTERED — an unregistered hash fails with the hash named, and a
      * wrong key fails the AEAD unwrap, never as wrong rows. An EXISTING
      * store's persisted profile governs reads and updates: updates to a
      * plaintext store stay plaintext, updates to an encrypted store keep
      * its key, and a constructor hash that CONTRADICTS the profile fails
      * with both named rather than being silently ignored. The one way to
      * change the profile is a full rebuild ([[writeInitial]] /
      * `publish(rebuild = true)`), which rewrites every data file and so
      * adopts the constructor's key. */
    val encryptionKeyHash: Option[String] = None) extends GridPublisher {

  // fail at construction, with the hash named, not mid-publish
  encryptionKeyHash.foreach(graft.functions.Encryption.requireKey)

  /** [[GridPublisher]] — one streaming micro-batch lands through the same
    * publish dispatch. */
  override def publishBatch(update: DataFrame): Unit = publish(update)


  import GridStore._

  private def timeCol = desc.timeDim

  // -------------------------------------------- parquet modular encryption

  /** The key hash this store's data files are (to be) encrypted under:
    * the persisted attr for an EXISTING store (its profile wins — a
    * plaintext store never gains mixed encrypted files and an encrypted
    * store never silently drops its key), the constructor's choice when
    * creating one. A constructor hash that CONTRADICTS an existing
    * store's profile fails with both named (ADVICE r8: silently ignoring
    * it handed plaintext data to a user who asked for encryption, and
    * kept the old key on an attempted rotation); the one path that may
    * legitimately change the profile is a full rebuild, because it
    * rewrites every data file — [[writeInitial]] adopts the constructor
    * key before this resolution runs. */
  private var resolvedEncryptionHash: Option[Option[String]] = None
  private def effectiveEncryptionHash: Option[String] =
    // cached per handle: the profile is immutable once resolved (a new
    // store adopts the constructor key, which writeInitial persists
    // before any data write), and every read/write path consults this —
    // re-reading the sidecar each time would be 4+ extra GETs per publish
    resolvedEncryptionHash.getOrElse {
      val resolved =
        if (hasExisting) {
          val persisted = readAttrs().get(EncryptionKeyHashAttr)
          if (encryptionKeyHash.isDefined && encryptionKeyHash != persisted)
            throw new IllegalStateException(
              s"Store at $path is ${persisted.fold("not encrypted")(h =>
                s"encrypted under key hash $h")} but this handle was " +
                s"constructed with key hash ${encryptionKeyHash.get}: an " +
                "existing store's persisted profile governs reads and " +
                "updates. To change the profile, rebuild the store " +
                "(publish(rebuild = true) / writeInitial), which rewrites " +
                "every data file and adopts the constructor's key")
          persisted
        } else encryptionKeyHash
      resolvedEncryptionHash = Some(resolved)
      resolved
    }

  /** Reader with decryption wired when the store is encrypted: the crypto
    * factory + the registry-backed KMS client; the master-key hash itself
    * rides in each file's key material, so readers only need the key
    * registered. */
  private def encryptedRead: org.apache.spark.sql.DataFrameReader =
    effectiveEncryptionHash match {
      case None => spark.read
      case Some(_) => spark.read.options(CryptoFactoryOptions)
    }

  /** Writer-side options for one job: footer + EVERY column of the frame
    * keyed under the master key (the `__bucket` partition column never
    * reaches the data pages). */
  private def cryptoWriteOptions(dataCols: Seq[String]): Map[String, String] =
    effectiveEncryptionHash match {
      case None => Map.empty
      case Some(kh) => CryptoFactoryOptions ++ Map(
        "parquet.encryption.footer.key" -> kh,
        "parquet.encryption.column.keys" ->
          s"$kh:${dataCols.filterNot(_ == "__bucket").mkString(",")}")
    }

  /** Directory-key expression for the time bucket. */
  private def bucketExpr = {
    val pattern = bucketSpan match {
      case TimeUnitKind.Days => "yyyy-MM-dd"
      case TimeUnitKind.Months => "yyyy-MM"
      case TimeUnitKind.Years => "yyyy"
      case other => throw new IllegalArgumentException(
        s"Unsupported bucket span: $other (use days/months/years)")
    }
    date_format(col(timeCol), pattern)
  }

  // ------------------------------------------------------------- existence

  /** S12 guard — `has_existing` (store.py:388-396): a store exists when its
    * attrs sidecar does. */
  def hasExisting: Boolean = {
    val fs = fileSystem(spark, path)
    fs.exists(new HPath(attrsPath))
  }

  /** S12 — open the existing store (store.py:182-198). NOTE: `__bucket` is
    * dropped here, so a time filter on this frame prunes via row-group
    * stats only; time-BOUNDED reads should use [[readRange]] /
    * [[readBuckets]], which filter the partition column before the drop and
    * skip unlisted bucket directories entirely. */
  def dataset(): DataFrame = {
    require(hasExisting, s"No existing store at $path")
    encryptedRead.parquet(dataPath)
      .withColumn(timeCol, col(timeCol).cast(TimestampNTZType))
      .drop("__bucket")
  }

  /** Partition-pruned read of specific buckets: the `__bucket` predicate is
    * applied to the partition column itself, so unselected directories are
    * never listed or footer-read — the mechanism every update-path read of
    * the existing store uses. */
  def readBuckets(buckets: Set[String]): DataFrame =
    encryptedRead.parquet(dataPath)
      .filter(col("__bucket").isin(buckets.toSeq: _*))
      .withColumn(timeCol, col(timeCol).cast(TimestampNTZType))
      .drop("__bucket")

  /** F1 at store level — time-range read with bucket-level partition
    * pruning (bucket strings sort chronologically) plus the exact time
    * predicate for row-group pruning within the edge buckets. */
  def readRange(start: java.time.LocalDateTime,
      end: java.time.LocalDateTime): DataFrame = {
    val fmtStr = bucketSpan match {
      case TimeUnitKind.Days => "yyyy-MM-dd"
      case TimeUnitKind.Months => "yyyy-MM"
      case TimeUnitKind.Years => "yyyy"
      case other => throw new IllegalArgumentException(s"Unsupported: $other")
    }
    val fmt = java.time.format.DateTimeFormatter.ofPattern(fmtStr)
    encryptedRead.parquet(dataPath)
      .filter(col("__bucket") >= start.format(fmt) &&
        col("__bucket") <= end.format(fmt))
      .withColumn(timeCol, col(timeCol).cast(TimestampNTZType))
      .filter(col(timeCol).between(lit(start), lit(end)))
      .drop("__bucket")
  }

  // ----------------------------------------------------------- attrs (W8)

  def attrsPath: String = s"$path/_graft_metadata/attrs.json"
  private def dataPath: String = s"$path/data"

  /** Attrs sidecar as the full JSON AST — provider metadata is arbitrarily
    * nested JSON in the reference (store.py:26-46's encoder); nested values
    * survive read-modify-write untouched. */
  def readAttrsJson(): graft.meta.JObj = {
    val fs = fileSystem(spark, path)
    val p = new HPath(attrsPath)
    if (!fs.exists(p)) graft.meta.JObj(Seq.empty)
    else {
      val in = fs.open(p)
      try graft.meta.JValue.parse(
          new String(in.readAllBytes(), StandardCharsets.UTF_8)) match {
        case o: graft.meta.JObj => o
        case _ => graft.meta.JObj(Seq.empty)
      }
      finally in.close()
    }
  }

  def writeAttrsJson(attrs: graft.meta.JObj): Unit = {
    val fs = fileSystem(spark, path)
    val out = fs.create(new HPath(attrsPath), true)
    try out.write(attrs.render.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Nested-safe partial update: only the given keys change. */
  def patchAttrsJson(patch: Map[String, graft.meta.JValue]): Unit =
    writeAttrsJson(patch.toSeq.sortBy(_._1).foldLeft(readAttrsJson()) {
      case (o, (k, v)) => o.updated(k, v)
    })

  /** Metadata-only read of the attrs sidecar as flat strings
    * (store.py:200-247) — string values verbatim, nested values rendered
    * to compact JSON (so flat consumers keep working over nested docs). */
  def readAttrs(): Map[String, String] =
    readAttrsJson().fields.map { case (k, v) =>
      k -> (v match {
        case graft.meta.JStr(s) => s
        case other => other.render
      })
    }.toMap

  def writeAttrs(attrs: Map[String, String]): Unit =
    writeAttrsJson(graft.meta.JObj(
      attrs.toSeq.sortBy(_._1).map { case (k, v) => k -> graft.meta.JStr(v) }))

  /** W8 partial update: patch only the given keys, preserving the rest —
    * including NESTED values of untouched keys; the failure path must
    * never clobber unrelated attrs (publish.py:211-266). */
  def patchAttrs(patch: Map[String, String]): Unit =
    patchAttrsJson(patch.map { case (k, v) => k -> (graft.meta.JStr(v): graft.meta.JValue) })

  // --------------------------------------------------- commit marker (W6)

  /** W10 — refuse to plan an update while another writer is in flight;
    * strict string "true" mirrors the reference's strict `is True`
    * (publish.py:358-375). */
  def checkNotInProgress(): Unit =
    if (readAttrs().get(UpdateInProgressKey).contains("true"))
      throw new IllegalStateException(
        s"Store at $path has update_in_progress=true; refusing concurrent update")

  /** W6 — the mini write-ahead protocol around every data write: set the
    * in-progress flag, run the write, then persist the full post-write
    * attrs with the flag cleared; on failure clear ONLY the flag
    * (publish.py:155-268). */
  private def withCommitMarker(postAttrs: => Map[String, String])(write: => Unit): Unit = {
    patchAttrs(Map(UpdateInProgressKey -> "true"))
    try {
      write
      // patch (not read++write-all): nested attrs of untouched keys survive
      patchAttrs(postAttrs + (UpdateInProgressKey -> "false"))
    } catch {
      case e: Throwable =>
        patchAttrs(Map(UpdateInProgressKey -> "false"))
        throw e
    }
  }

  // -------------------------------------------------------------- writes

  private def layout(df: DataFrame): DataFrame = {
    val sortCols = (timeCol +: desc.standardDims.filter(df.columns.contains))
      .distinct.map(col)
    // Range-partition on (bucket, sort dims): a plain repartition(bucket)
    // would cap write parallelism at one task per bucket — a hot bucket of
    // a 100 TB store would funnel through a single task. Range partitioning
    // splits large buckets across tasks by sort-dim ranges (files within a
    // bucket stay sorted and non-overlapping — the chunk-grid analog) while
    // small buckets still coalesce into few files.
    df.withColumn("__bucket", bucketExpr)
      .repartitionByRange((col("__bucket") +: sortCols): _*)
      .sortWithinPartitions(sortCols: _*)
  }

  private def writeJob(df: DataFrame, mode: String, dynamic: Boolean = false): Unit = {
    // The overwrite mode rides on the writer, not the session conf: inside
    // foreachBatch the batch frame belongs to streaming's CLONED session, so
    // a session-conf toggle on the captured session would silently leave the
    // write in static mode and wipe every untouched partition.
    layout(df).write
      .mode(mode)
      .option("partitionOverwriteMode", if (dynamic) "dynamic" else "static")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression",
        if (compression == "none") "uncompressed" else compression)
      .options(cryptoWriteOptions(df.columns.toSeq))
      .partitionBy("__bucket")
      .parquet(dataPath)
    // Spark caches the file listing per path; after an in-place partition
    // overwrite a reader holding the stale index hits FILE_NOT_EXIST.
    spark.catalog.refreshByPath(dataPath)
  }

  /** Sever plan lineage from the store's files before overwriting them:
    * a frame that reads the same buckets it is about to replace must be
    * materialized first (executor-local, bucket-bounded — never the whole
    * store). */
  private def materialize(df: DataFrame): DataFrame = df.localCheckpoint(true)

  /** W3 — initial write (publish.py:301-318). */
  def writeInitial(df: DataFrame, dryRun: Boolean = false): Unit = {
    if (dryRun) return
    // A full (re)build rewrites EVERY data file, so it is the one path
    // that may change the profile: an explicit constructor key is adopted
    // (encrypting a plaintext store, or rotating an encrypted one);
    // omitting the key keeps the persisted profile, so a rebuild never
    // silently decrypts.
    //
    // WHEN the adopted hash persists differs by case (ADVICE r9):
    //  - NEW store: before the commit marker creates the sidecar, so the
    //    store never "exists" without its profile (a failed first write
    //    leaves attrs and partial files agreeing on the same key).
    //  - EXISTING store whose profile CHANGES: only with the post-write
    //    attrs, inside the marker. The rebuild job already encrypts under
    //    the new key via the in-memory resolution below; persisting the
    //    hash early meant a failed job left the sidecar advertising a key
    //    the surviving files don't carry, and later updates from a fresh
    //    handle would silently produce a mixed-key store. With the old
    //    hash still persisted, a failed rotation reads as loud AEAD
    //    errors until the rebuild is retried.
    val persisted =
      if (hasExisting) readAttrs().get(EncryptionKeyHashAttr) else None
    val adopted = encryptionKeyHash.orElse(persisted)
    if (!hasExisting) adopted.foreach(kh =>
      patchAttrs(Map(EncryptionKeyHashAttr -> kh)))
    resolvedEncryptionHash = Some(adopted)
    val rotation: Map[String, String] =
      if (hasExisting && adopted != persisted)
        Map(EncryptionKeyHashAttr -> adopted.get)
      else Map.empty
    // Overlap the attrs stats aggregate with the data write (guide §2.6):
    // both read df independently, and the aggregate's scalars are only
    // consumed AFTER the write succeeds (withCommitMarker evaluates
    // postAttrs lazily) — so the formerly-serial stats job now back-fills
    // while the write's tail drains. A failed write just abandons the
    // (read-only) stats future.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext = ZarrStore.axisEc
    val statsF = Future {
      spark.sparkContext.setJobDescription("graft.store: initial attrs stats")
      try updateStats(df)
      finally spark.sparkContext.setJobDescription(null)
    }
    withCommitMarker(computedAttrs(df, isUpdate = false,
        Some(Await.result(statsF, Duration.Inf))) ++ rotation) {
      writeJob(df, "overwrite")
    }
  }

  /** Pad the delta back to bucket completeness with `combineFirst` (J3,
    * publish.py:1341-1385) — this both completes a partial tail bucket on
    * append (the chunk-butt-join analog of publish.py:520-553) and
    * preserves unreplaced cells on insert. The original side is bounded to
    * the touched buckets FIRST, so the full-outer join never sees the rest
    * of the store. When padding applies, the result is MATERIALIZED here
    * (read-only — severs lineage from the store files the write will
    * replace), so [[runUpdate]] can run this job CONCURRENTLY with the
    * quality gate (guide §2.6). Returns (frame, wasPadded) — a padded
    * frame's checkpoint blocks are the caller's to release after the
    * write lands. */
  private def paddedDelta(df: DataFrame, touched: Set[String]): (DataFrame, Boolean) = {
    val overlap = existingBuckets.intersect(touched)
    if (overlap.isEmpty) (df, false)
    else {
      // partition-pruned: only the overlapping bucket dirs are listed
      val original = readBuckets(overlap)
      val keys = desc.standardDims.filter(df.columns.contains)
      (materialize(UpdatePlan.combineFirst(df, original, keys, desc.dataVar)), true)
    }
  }

  // W4 + W5 note: the delta write itself is ONE dynamic-partition-overwrite
  // job (see runUpdate), because dynamic overwrite replaces touched buckets
  // (inserts, publish.py:406-450) and creates brand-new ones (appends,
  // publish.py:452-478) in the same pass.

  /** Maintenance — compact the given buckets (default: all): incremental
    * appends accumulate small files per bucket; compaction rewrites each
    * selected bucket as maxRecordsPerFile-sized sorted files via the same
    * dynamic-overwrite path as inserts, under the commit marker, leaving
    * attrs untouched. The store-layout "gardening" analog of the
    * reference's offline rechunking (metadata.py:961-1072). */
  def compact(buckets: Set[String] = Set.empty): Unit = {
    checkNotInProgress()
    val target = if (buckets.isEmpty) existingBuckets else buckets
    if (target.isEmpty) return
    withCommitMarker(Map.empty) {
      val data = materialize(readBuckets(target))
      writeJob(data, "overwrite", dynamic = true)
      graft.Housekeeping.release(data)
    }
  }

  /** W2 — publish dispatch (publish.py:86-129): initial when nothing
    * exists (or rebuilding), else classify + insert + append. */
  def publish(
      update: DataFrame,
      rebuild: Boolean = false,
      allowOverwrite: Boolean = true,
      dryRun: Boolean = false): Unit = {
    if (!hasExisting || rebuild) {
      if (hasExisting && rebuild && !allowOverwrite)
        throw new IllegalStateException(
          "Rebuild of an existing store requires allowOverwrite " +
            "(publish.py:342-348 semantics)")
      writeInitial(update, dryRun)
    } else runUpdate(update, dryRun)
  }

  /** Update path (publish.py:322-356): guard, classify times, gate, insert
    * per region, then append. */
  private def runUpdate(updateDf0: DataFrame, dryRun: Boolean): Unit = {
    checkNotInProgress()
    // Materialize the delta ONCE: classification, gate checks, bucket
    // discovery, and both write paths all re-read it, and its lineage may be
    // an arbitrary upstream pipeline. An update is a bounded delta relative
    // to the store (the reference holds it in memory too), so this is an
    // executor-local checkpoint of the small side, never the store. LAZY
    // (r16): the stats aggregate right below is the first action and
    // materializes the blocks as it folds — an eager checkpoint was a
    // whole extra job per publish.
    val updateDf = updateDf0.localCheckpoint(false)
    // Classification only needs the store's times INSIDE the update window
    // (a time can only be an insert if both sides contain it), so the
    // existing side is a bucket-pruned range read — never a full-store
    // scan, even of just the time column. The ONE updateStats action also
    // serves attrs assembly and bucket planning below.
    val stats = updateStats(updateDf)
    // The gate's ONE aggregate action, scoped so `classified` — whose plan
    // reads the CURRENT store files — cannot gain a post-write consumer
    // (the write below replaces those files; a later read of this frame
    // would be the read-after-replace bug the r15-dropped defensive
    // checkpoint used to paper over). StoreGateOrderSpec pins the ordering
    // at the job level. `classified` is one row per distinct update
    // timestep plus ONE `existing_end` row — the store's last-bucket max
    // time rides in the same job instead of its own scan action.
    def runGate(): Unit = {
      val existing = readRange(stats.uLo, stats.uHi)
      val classified =
        UpdatePlan.classifyUpdateTimes(existing, updateDf, timeCol)
          .unionByName(existingEndFrame)
      spark.sparkContext.setJobDescription("graft.store: update gate")
      try UpdatePlan.updateQualityCheckClassified(classified, timeCol,
        desc.timeResolution, desc.updateCadenceBounds)
      finally spark.sparkContext.setJobDescription(null)
    }
    if (dryRun) {
      runGate()
      graft.Housekeeping.release(updateDf)
      return
    }
    // Overlap the gate with the padding read (guide §2.6): both are
    // INDEPENDENT read-only jobs over pre-write store files — the gate's
    // aggregate and the combine-first materialization — and both must
    // finish before the data write. Running the padding job on the shared
    // store pool lets its tasks back-fill executors while the gate's
    // (driver-latency-bound) aggregate round-trips; job descriptions are
    // thread-local so the ordering spec can tell them apart. The gate
    // still completes BEFORE any write: writeJob runs only after both the
    // Await and a successful gate.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext = ZarrStore.axisEc
    val padF = Future {
      spark.sparkContext.setJobDescription("graft.store: padding read")
      try paddedDelta(updateDf, stats.touched)
      finally spark.sparkContext.setJobDescription(null)
    }
    val gateOutcome = scala.util.Try(runGate())
    // the padding job must complete either way — a failed gate must not
    // leave its checkpoint job racing a caller's retry
    val padOutcome = scala.util.Try(Await.result(padF, Duration.Inf))
    gateOutcome.failed.foreach { e =>
      padOutcome.foreach { case (padded, wasPadded) =>
        if (wasPadded) graft.Housekeeping.release(padded)
      }
      graft.Housekeeping.release(updateDf)
      throw e
    }
    val (padded, wasPadded) = padOutcome.get
    try {
      withCommitMarker(computedAttrs(updateDf, isUpdate = true, Some(stats))) {
        spark.sparkContext.setJobDescription("graft.store: delta write")
        try writeJob(padded, "overwrite", dynamic = true)
        finally spark.sparkContext.setJobDescription(null)
      }
    } finally {
      // every consumer (gate, padding, write) has run: the update delta's
      // (and the padded frame's) checkpoint blocks are dead
      if (wasPadded) graft.Housekeeping.release(padded)
      graft.Housekeeping.release(updateDf)
    }
  }

  // ------------------------------------------------------------- helpers

  /** Max time of the existing store as a ONE-ROW PLAN (no action), read
    * from the LAST bucket only — partition pruning makes this one
    * directory's footers, not a full-store scan (the
    * binary-search-the-manifest analog, publish.py:897-949). Shaped as a
    * `(timeCol, kind="existing_end")` row so it unions into the classified
    * frame and rides the classification job. */
  private def existingEndFrame: DataFrame = {
    val bounded = existingBuckets.toSeq.sorted.lastOption match {
      case Some(last) =>
        encryptedRead.parquet(dataPath).filter(col("__bucket") === last)
      case None => encryptedRead.parquet(dataPath)
    }
    bounded.agg(max(col(timeCol).cast(TimestampNTZType)).as(timeCol))
      .select(col(timeCol), lit("existing_end").as("kind"))
  }

  private def existingBuckets: Set[String] = {
    val fs = fileSystem(spark, path)
    val p = new HPath(dataPath)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("__bucket="))
      .map(_.stripPrefix("__bucket="))
      .toSet
  }

  /** W14 — attrs assembly after a write (metadata.py:870-921): date range,
    * update range, previous end, append-only flag, bbox when the frame
    * carries lat/lon spatial dims. */
  /** One multi-aggregate over the update frame serving EVERY scalar the
    * publish protocol needs — raw time bounds (classification window),
    * formatted date range + bbox (attrs assembly), and the touched bucket
    * set (dynamic-overwrite planning). Folding these into a single action
    * is what keeps the per-publish driver job count flat: each extra
    * scalar round-trip is protocol latency, not data volume. */
  private[store] final case class UpdateStats(
      uLo: java.time.LocalDateTime, uHi: java.time.LocalDateTime,
      lo: String, hi: String,
      bbox: Option[(Double, Double, Double, Double)],
      touched: Set[String])

  private def hasBboxCols(df: DataFrame): Boolean = {
    val spatial = desc.spatialDims.take(2)
    spatial.length == 2 && spatial.forall(df.columns.contains) &&
      spatial == Seq("latitude", "longitude")
  }

  private def updateStats(df: DataFrame): UpdateStats = {
    val fmt = "yyyyMMddHH"
    val hasBbox = hasBboxCols(df)
    val aggs = Seq(
      min(col(timeCol).cast(TimestampNTZType)).as("raw_lo"),
      max(col(timeCol).cast(TimestampNTZType)).as("raw_hi"),
      date_format(min(col(timeCol)), fmt).as("lo"),
      date_format(max(col(timeCol)), fmt).as("hi"),
      collect_set(bucketExpr).as("touched")) ++
      (if (hasBbox) Seq(
        round(min(col("longitude")), desc.bboxRounding).as("bb0"),
        round(min(col("latitude")), desc.bboxRounding).as("bb1"),
        round(max(col("longitude")), desc.bboxRounding).as("bb2"),
        round(max(col("latitude")), desc.bboxRounding).as("bb3"))
      else Seq.empty)
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    UpdateStats(
      uLo = r.getAs[java.time.LocalDateTime]("raw_lo"),
      uHi = r.getAs[java.time.LocalDateTime]("raw_hi"),
      lo = r.getAs[String]("lo"), hi = r.getAs[String]("hi"),
      bbox = if (!hasBbox) None
        else Some((r.getAs[Double]("bb0"), r.getAs[Double]("bb1"),
          r.getAs[Double]("bb2"), r.getAs[Double]("bb3"))),
      touched = r.getAs[Seq[String]]("touched").toSet)
  }

  private def computedAttrs(df: DataFrame, isUpdate: Boolean,
      pre: Option[UpdateStats] = None): Map[String, String] = {
    val stats = pre.getOrElse(updateStats(df))
    val (lo, hi) = (stats.lo, stats.hi)
    val prior = readAttrs() // one sidecar read serves bbox merge + ranges
    val bboxAttrs = stats.bbox match {
      case None => Map.empty[String, String]
      case Some((bb0, bb1, bb2, bb3)) =>
        // union-extend the prior bbox (metadata.py bbox merge semantics)
        val merged = prior.get("bbox") match {
          case Some(old) if isUpdate =>
            val o = old.split(",").map(_.toDouble)
            Seq(math.min(o(0), bb0), math.min(o(1), bb1),
              math.max(o(2), bb2), math.max(o(3), bb3))
          case _ => Seq(bb0, bb1, bb2, bb3)
        }
        Map("bbox" -> merged.mkString(","))
    }
    val start = if (isUpdate) prior.getOrElse("date_range_start", lo) else lo
    val priorEnd = prior.get("date_range_end")
    val end = priorEnd.filter(_ > hi).getOrElse(hi)
    Map(
      "dataset_name" -> desc.datasetName,
      "data_var" -> desc.dataVar,
      "time_resolution" -> desc.timeResolution.toString,
      "date_range_start" -> start,
      "date_range_end" -> end,
      "update_date_range_start" -> lo,
      "update_date_range_end" -> hi,
      "update_is_append_only" -> (!isUpdate).toString,
      "update_previous_end_date" -> priorEnd.getOrElse(""),
    ) ++ bboxAttrs ++ desc.staticMetadata
  }
}

object GridStore {
  val UpdateInProgressKey = "update_in_progress"

  /** Attrs key persisting the store's master-key hash (never the key) —
    * the parquet analog of the zarr filter chain's key_hash config. */
  val EncryptionKeyHashAttr = "encryption_key_hash"

  /** Parquet Modular Encryption plumbing shared by every encrypted read
    * and write: parquet-mr's properties-driven factory + the
    * registry-backed KMS client. */
  val CryptoFactoryOptions: Map[String, String] = Map(
    "parquet.crypto.factory.class" ->
      "org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory",
    "parquet.encryption.kms.client.class" -> "graft.store.GraftKmsClient")

  def fileSystem(spark: SparkSession, path: String): FileSystem =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // The attrs sidecar codec is the shared graft.meta JSON AST (nested
  // values first-class, store.py:26-46 parity); see read/writeAttrsJson.
}

package graft.sources.nc

import java.io.{DataInputStream, DataOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets

/** NetCDF classic ("CDF-1"/"CDF-2") binary format model: header parser and
  * writer for the subset the DSv2 scan supports (S9's real form — the
  * reference ingests NetCDF via kerchunk, transform.py:119-279; here the
  * format itself is parsed from the public Unidata spec).
  *
  * Subset: dimensions (one optional record dimension), global + variable
  * text/numeric attributes, variables of NC_BYTE/SHORT/INT/FLOAT/DOUBLE.
  * Big-endian throughout, per the spec. CDF-1 uses 4-byte variable offsets,
  * CDF-2 8-byte; both are parsed, the writer emits CDF-1 unless the layout
  * needs 64-bit offsets.
  */
object NcFormat {

  // nc_type tags (spec section "The format in detail")
  val NcByte = 1
  val NcChar = 2
  val NcShort = 3
  val NcInt = 4
  val NcFloat = 5
  val NcDouble = 6

  def typeSize(t: Int): Int = t match {
    case NcByte | NcChar => 1
    case NcShort => 2
    case NcInt | NcFloat => 4
    case NcDouble => 8
    case other => throw new IllegalArgumentException(s"Unknown nc_type $other")
  }

  private val TagDimension = 0x0A
  private val TagVariable = 0x0B
  private val TagAttribute = 0x0C

  /** `length == 0` in the file marks the record dimension; `length` here is
    * the materialized length (numrecs for the record dim). */
  final case class NcDim(name: String, length: Int, isRecord: Boolean)

  /** Attribute values: text (NC_CHAR) or numeric widened to double. */
  final case class NcAttr(name: String, text: Option[String], nums: Option[Array[Double]]) {
    def asText: String = text.getOrElse(nums.map(_.mkString(",")).getOrElse(""))
    def asNum: Option[Double] = nums.flatMap(_.headOption)
  }

  final case class NcVar(
      name: String,
      dimIds: Seq[Int],
      ncType: Int,
      attrs: Map[String, NcAttr],
      begin: Long) {
    def attr(n: String): Option[String] = attrs.get(n).map(_.asText)
    def numAttr(n: String): Option[Double] = attrs.get(n).flatMap(_.asNum)

    /** CF packed-data decode parameters (mask_and_scale — the reference gets
      * this from xarray's decode_cf; here read straight from the attrs).
      * `unpack` is attr PRESENCE, not value: an explicit `scale_factor: 1.0`
      * still means "unpacked values are floating point" per CF §8.1. */
    def scaleFactor: Double = numAttr("scale_factor").getOrElse(1.0)
    def addOffset: Double = numAttr("add_offset").getOrElse(0.0)
    def unpack: Boolean = attrs.contains("scale_factor") || attrs.contains("add_offset")
    /** `_FillValue` wins over `missing_value` when both are present (CF §2.5.1). */
    def fillValue: Option[Double] = numAttr("_FillValue").orElse(numAttr("missing_value"))
  }

  /** Fill comparison in the VARIABLE's precision: a _FillValue attr stored
    * wider than the variable (an NC_DOUBLE 9.96921e36 against an NC_FLOAT
    * var — a common CF-checker violation in wild files) must still match
    * the float-widened raw value, or fill cells silently surface as ~1e37
    * data. NaN fills match NaN raws. */
  def fillMatches(raw: Double, fill: Double, ncType: Int): Boolean =
    (raw.isNaN && fill.isNaN) || (ncType match {
      case NcFloat => raw.toFloat == fill.toFloat
      case _ => raw == fill
    })

  final case class NcHeader(
      version: Int,
      numRecs: Int,
      dims: Seq[NcDim],
      gattrs: Map[String, NcAttr],
      vars: Seq[NcVar]) {

    def recDimId: Int = dims.indexWhere(_.isRecord)

    def isRecordVar(v: NcVar): Boolean =
      recDimId >= 0 && v.dimIds.headOption.contains(recDimId)

    /** Bytes of one record-slab of a record var (non-record dims only),
      * unpadded. */
    def perRecordSize(v: NcVar): Long =
      v.dimIds.drop(1).map(dims(_).length.toLong).product * typeSize(v.ncType)

    /** Bytes of a whole fixed var. */
    def fixedSize(v: NcVar): Long =
      v.dimIds.map(dims(_).length.toLong).product * typeSize(v.ncType)

    /** Stride between consecutive records (spec: sum of padded per-record
      * sizes; a SINGLE record variable is not padded). */
    def recSize: Long = {
      val rvs = vars.filter(isRecordVar)
      if (rvs.length == 1) perRecordSize(rvs.head)
      else rvs.map(v => pad4(perRecordSize(v))).sum
    }
  }

  def pad4(n: Long): Long = (n + 3) / 4 * 4
  def pad4(n: Int): Int = (n + 3) / 4 * 4

  // -------------------------------------------------------------- parsing

  /** Parse the header from the start of a classic NetCDF stream. The stream
    * is consumed exactly through the end of the header. */
  def parseHeader(in0: InputStream): NcHeader = {
    val in = new DataInputStream(in0)
    val magic = new Array[Byte](3)
    in.readFully(magic)
    require(new String(magic, StandardCharsets.US_ASCII) == "CDF",
      "Not a classic NetCDF file (bad magic)")
    val version = in.readByte().toInt
    require(version == 1 || version == 2, s"Unsupported CDF version $version")
    val numRecsRaw = in.readInt()
    val dims = readDimList(in)
    val gattrs = readAttrList(in)
    val vars = readVarList(in, version)
    // STREAMING numrecs (all 1s) is not produced by our writer; reject
    // rather than guess from the file length.
    require(numRecsRaw != -1, "STREAMING numrecs is not supported")
    val withRec = dims.map(d => if (d.isRecord) d.copy(length = numRecsRaw) else d)
    NcHeader(version, numRecsRaw, withRec, gattrs, vars)
  }

  private def readName(in: DataInputStream): String = {
    val n = in.readInt()
    val bytes = new Array[Byte](pad4(n))
    in.readFully(bytes)
    new String(bytes, 0, n, StandardCharsets.UTF_8)
  }

  private def readTagged(in: DataInputStream, expectedTag: Int): Int = {
    val tag = in.readInt()
    val n = in.readInt()
    require(tag == expectedTag || (tag == 0 && n == 0),
      s"Malformed header: tag $tag (expected $expectedTag or ABSENT)")
    n
  }

  private def readDimList(in: DataInputStream): Seq[NcDim] = {
    val n = readTagged(in, TagDimension)
    (0 until n).map { _ =>
      val name = readName(in)
      val len = in.readInt()
      NcDim(name, len, isRecord = len == 0)
    }
  }

  private def readAttrList(in: DataInputStream): Map[String, NcAttr] = {
    val n = readTagged(in, TagAttribute)
    (0 until n).map { _ =>
      val name = readName(in)
      val t = in.readInt()
      val nelems = in.readInt()
      val raw = new Array[Byte](pad4(nelems * typeSize(t)))
      in.readFully(raw)
      val bb = java.nio.ByteBuffer.wrap(raw)
      val attr = t match {
        case NcChar => NcAttr(name, Some(new String(raw, 0, nelems, StandardCharsets.UTF_8)), None)
        case NcByte => NcAttr(name, None, Some(Array.tabulate(nelems)(i => raw(i).toDouble)))
        case NcShort => NcAttr(name, None, Some(Array.tabulate(nelems)(i => bb.getShort(i * 2).toDouble)))
        case NcInt => NcAttr(name, None, Some(Array.tabulate(nelems)(i => bb.getInt(i * 4).toDouble)))
        case NcFloat => NcAttr(name, None, Some(Array.tabulate(nelems)(i => bb.getFloat(i * 4).toDouble)))
        case NcDouble => NcAttr(name, None, Some(Array.tabulate(nelems)(i => bb.getDouble(i * 8))))
      }
      name -> attr
    }.toMap
  }

  private def readVarList(in: DataInputStream, version: Int): Seq[NcVar] = {
    val n = readTagged(in, TagVariable)
    (0 until n).map { _ =>
      val name = readName(in)
      val ndims = in.readInt()
      val dimIds = (0 until ndims).map(_ => in.readInt())
      val attrs = readAttrList(in)
      val t = in.readInt()
      val _vsize = in.readInt() // stored vsize may overflow; recomputed on use
      val begin = if (version == 1) in.readInt().toLong & 0xFFFFFFFFL else in.readLong()
      NcVar(name, dimIds, t, attrs, begin)
    }
  }

  // -------------------------------------------------------------- writing

  /** Variable to write: `data` is the row-major cell array (record dim
    * first, if any) widened to double; it is narrowed back per `ncType`.
    * `nattrs` are numeric attributes as (name, nc_type, values) — e.g. CF
    * packing attrs scale_factor/add_offset/_FillValue. */
  final case class WriteVar(
      name: String,
      dims: Seq[String],
      ncType: Int,
      data: Array[Double],
      attrs: Seq[(String, String)] = Nil,
      nattrs: Seq[(String, Int, Array[Double])] = Nil)

  /** Write a classic NetCDF file — CDF-1 normally, CDF-2 (64-bit offsets)
    * automatically when the layout's variable begins exceed 32 bits (the
    * classic large-file rule), or when `forceVersion` pins one (tests
    * exercise the CDF-2 header path without writing a 2 GB file). `dims`
    * carries materialized lengths; `recordDim`, if set, must be the FIRST
    * dim of every variable that uses it (classic-format rule). */
  def write(
      out: DataOutputStream,
      dims: Seq[(String, Int)],
      vars: Seq[WriteVar],
      recordDim: Option[String] = None,
      gattrs: Seq[(String, String)] = Nil,
      forceVersion: Option[Int] = None): Unit = {
    forceVersion.foreach(v => require(v == 1 || v == 2,
      s"forceVersion $v not in {1, 2}"))
    val dimIdx = dims.map(_._1).zipWithIndex.toMap
    val dimLen = dims.toMap
    recordDim.foreach { rd =>
      require(dimIdx.contains(rd), s"record dim $rd not declared")
      vars.foreach { v =>
        require(!v.dims.contains(rd) || v.dims.head == rd,
          s"record dim must be first in var ${v.name}")
      }
    }
    val numRecs = recordDim.map(dimLen).getOrElse(0)
    vars.foreach { v =>
      val expect = v.dims.map(dimLen(_).toLong).product
      require(v.data.length == expect,
        s"var ${v.name}: ${v.data.length} cells, dims imply $expect")
    }

    def isRec(v: WriteVar) = recordDim.exists(v.dims.headOption.contains)
    val (recVars, fixedVars) = vars.partition(isRec)
    def perRecBytes(v: WriteVar): Long =
      v.dims.drop(1).map(dimLen(_).toLong).product * typeSize(v.ncType)
    def fixedBytes(v: WriteVar): Long =
      v.dims.map(dimLen(_).toLong).product * typeSize(v.ncType)

    // Two-pass: serialize header with zero begins to learn its length, then
    // place fixed vars (padded to 4) followed by the record region.
    def headerBytes(begins: Map[String, Long], version: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(bos)
      d.writeBytes("CDF"); d.writeByte(version)
      d.writeInt(numRecs)
      // dim list
      d.writeInt(TagDimension); d.writeInt(dims.length)
      dims.foreach { case (name, len) =>
        writeName(d, name)
        d.writeInt(if (recordDim.contains(name)) 0 else len)
      }
      writeAttrList(d, gattrs)
      d.writeInt(TagVariable); d.writeInt(vars.length)
      vars.foreach { v =>
        writeName(d, v.name)
        d.writeInt(v.dims.length)
        v.dims.foreach(dn => d.writeInt(dimIdx(dn)))
        writeAttrList(d, v.attrs, v.nattrs)
        d.writeInt(v.ncType)
        val vsize = pad4(if (isRec(v)) perRecBytes(v) else fixedBytes(v))
        // vsize is an UNSIGNED 32-bit field; beyond its 2^32-4 maximum the
        // spec stores the all-ones sentinel and readers recompute the true
        // size (clamping to Int.MaxValue would feed external readers a
        // wrong record stride)
        d.writeInt(if (vsize > 0xFFFFFFFCL) -1 else vsize.toInt)
        // CDF-1 carries 32-bit variable begins, CDF-2 64-bit
        if (version == 2) d.writeLong(begins.getOrElse(v.name, 0L))
        else d.writeInt(begins.getOrElse(v.name, 0L).toInt)
      }
      d.flush(); bos.toByteArray
    }

    // the header length itself depends on the version (4 vs 8 bytes per
    // begin), so layout is computed per candidate version
    def layout(version: Int): Map[String, Long] = {
      val headerLen = headerBytes(Map.empty, version).length.toLong
      var offset = pad4(headerLen)
      val begins = scala.collection.mutable.Map.empty[String, Long]
      fixedVars.foreach { v =>
        begins(v.name) = offset
        offset += pad4(fixedBytes(v))
      }
      val singleRec = recVars.length == 1
      recVars.foreach { v =>
        begins(v.name) = offset
        offset += (if (singleRec) perRecBytes(v) else pad4(perRecBytes(v)))
      }
      begins.toMap
    }
    def fitsCdf1(b: Map[String, Long]) = b.values.forall(_ <= Int.MaxValue.toLong)
    val singleRec = recVars.length == 1
    val (version, begins) = forceVersion match {
      case Some(1) =>
        val b = layout(1)
        require(fitsCdf1(b), "Layout exceeds CDF-1 32-bit offsets; use CDF-2")
        (1, b)
      case Some(2) => (2, layout(2))
      case _ =>
        val b1 = layout(1)
        if (fitsCdf1(b1)) (1, b1) else (2, layout(2))
    }

    val hdr = headerBytes(begins, version)
    out.write(hdr)
    padTo4(out, hdr.length.toLong)

    def writeCells(v: WriteVar, from: Long, count: Long): Long = {
      var i = from
      val end = from + count
      while (i < end) {
        v.ncType match {
          case NcByte | NcChar => out.writeByte(v.data(i.toInt).toInt)
          case NcShort => out.writeShort(v.data(i.toInt).toInt)
          case NcInt => out.writeInt(v.data(i.toInt).toInt)
          case NcFloat => out.writeFloat(v.data(i.toInt).toFloat)
          case NcDouble => out.writeDouble(v.data(i.toInt))
        }
        i += 1
      }
      count * typeSize(v.ncType)
    }

    fixedVars.foreach { v =>
      val written = writeCells(v, 0L, fixedBytes(v) / typeSize(v.ncType))
      padTo4(out, written)
    }
    // record region: records interleave the record vars
    for (r <- 0 until numRecs; v <- recVars) {
      val cellsPerRec = perRecBytes(v) / typeSize(v.ncType)
      val written = writeCells(v, r.toLong * cellsPerRec, cellsPerRec)
      if (!singleRec) padTo4(out, written)
    }
    out.flush()
  }

  private def writeName(d: DataOutputStream, name: String): Unit = {
    val b = name.getBytes(StandardCharsets.UTF_8)
    d.writeInt(b.length)
    d.write(b)
    d.write(new Array[Byte](pad4(b.length) - b.length))
  }

  private def writeAttrList(
      d: DataOutputStream,
      attrs: Seq[(String, String)],
      nattrs: Seq[(String, Int, Array[Double])] = Nil): Unit = {
    if (attrs.isEmpty && nattrs.isEmpty) { d.writeInt(0); d.writeInt(0) }
    else {
      d.writeInt(TagAttribute); d.writeInt(attrs.length + nattrs.length)
      attrs.foreach { case (name, value) =>
        writeName(d, name)
        d.writeInt(NcChar)
        val b = value.getBytes(StandardCharsets.UTF_8)
        d.writeInt(b.length)
        d.write(b)
        d.write(new Array[Byte](pad4(b.length) - b.length))
      }
      nattrs.foreach { case (name, t, vals) =>
        writeName(d, name)
        d.writeInt(t)
        d.writeInt(vals.length)
        var written = 0L
        vals.foreach { v =>
          t match {
            case NcByte | NcChar => d.writeByte(v.toInt)
            case NcShort => d.writeShort(v.toInt)
            case NcInt => d.writeInt(v.toInt)
            case NcFloat => d.writeFloat(v.toFloat)
            case NcDouble => d.writeDouble(v)
          }
          written += typeSize(t)
        }
        d.write(new Array[Byte]((pad4(written) - written).toInt))
      }
    }
  }

  private def padTo4(out: DataOutputStream, written: Long): Unit = {
    val rem = (4 - (written % 4)) % 4
    if (rem > 0) out.write(new Array[Byte](rem.toInt))
  }

  /** Convenience: write to a local or Hadoop-visible path. */
  def writeFile(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      dims: Seq[(String, Int)],
      vars: Seq[WriteVar],
      recordDim: Option[String] = None,
      gattrs: Seq[(String, String)] = Nil,
      forceVersion: Option[Int] = None): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new DataOutputStream(new java.io.BufferedOutputStream(
      fs.create(new org.apache.hadoop.fs.Path(path), true)))
    try write(out, dims, vars, recordDim, gattrs, forceVersion)
    finally out.close()
  }

  /** CF-style time units: "<unit> since <epoch>" → (micros multiplier,
    * epoch micros). Public CF convention, e.g. "hours since 2024-01-01". */
  def parseTimeUnits(units: String): Option[(Long, Long)] = {
    val m = "(?i)(microsecond|millisecond|second|minute|hour|day)s?\\s+since\\s+(.+)".r
    units.trim match {
      case m(unit, epochStr) =>
        val mult = unit.toLowerCase match {
          case "microsecond" => 1L
          case "millisecond" => 1000L
          case "second" => 1000000L
          case "minute" => 60L * 1000000L
          case "hour" => 3600L * 1000000L
          case "day" => 86400L * 1000000L
        }
        // real-world CF epochs are often NOT zero-padded ("days since
        // 1980-1-1 0:0:0", CHIRPS) — parse digit groups, not ISO strings
        val dt = ("(\\d{1,4})-(\\d{1,2})-(\\d{1,2})" +
          "(?:[T ](\\d{1,2}):(\\d{1,2})(?::(\\d{1,2})(?:\\.\\d+)?)?)?" +
          "(?:\\s*(?:Z|UTC|\\+0+:?0*))?").r
        epochStr.trim match {
          case dt(y, mo, d, h, mi, sec) =>
            try {
              val ldt = java.time.LocalDateTime.of(y.toInt, mo.toInt, d.toInt,
                Option(h).map(_.toInt).getOrElse(0),
                Option(mi).map(_.toInt).getOrElse(0),
                Option(sec).map(_.toInt).getOrElse(0))
              Some((mult, ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L))
            } catch { case _: java.time.DateTimeException => None }
          case _ => None
        }
      case _ => None
    }
  }

  /** Read and decode a whole 1-D variable (coordinate axes are small —
    * driver-side planning reads them once per file). */
  def readCoordValues(
      in: org.apache.hadoop.fs.FSDataInputStream,
      header: NcHeader,
      v: NcVar): Array[Double] = {
    require(v.dimIds.length == 1, s"${v.name} is not 1-D")
    val isRec = header.isRecordVar(v)
    val n = header.dims(v.dimIds.head).length
    val ts = typeSize(v.ncType)
    val out = new Array[Double](n)
    if (isRec) {
      // one value per record, strided by recSize
      val buf = new Array[Byte](ts)
      var r = 0
      while (r < n) {
        in.readFully(v.begin + r * header.recSize, buf)
        out(r) = decodeOne(buf, 0, v.ncType)
        r += 1
      }
    } else {
      val buf = new Array[Byte](n * ts)
      in.readFully(v.begin, buf)
      var i = 0
      while (i < n) { out(i) = decodeOne(buf, i * ts, v.ncType); i += 1 }
    }
    out
  }

  def decodeOne(buf: Array[Byte], off: Int, ncType: Int): Double = {
    val bb = java.nio.ByteBuffer.wrap(buf)
    ncType match {
      case NcByte => buf(off).toDouble
      case NcShort => bb.getShort(off).toDouble
      case NcInt => bb.getInt(off).toDouble
      case NcFloat => bb.getFloat(off).toDouble
      case NcDouble => bb.getDouble(off)
      case NcChar => (buf(off) & 0xFF).toDouble
    }
  }
}

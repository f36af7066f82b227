package graft.sources.h5

import java.util.zip.Deflater

import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Minimal netCDF-4 (HDF5) WRITER — enough to produce spec-faithful
  * fixtures for the HDF5 scan path (the format the reference recommends
  * converting everything to, transform.py:136-155). Emits the classic
  * HDF5 1.8 "old-style" layout, all checksum-free:
  *
  *  - superblock v0, root group as symbol table (v1 B-tree + local heap +
  *    SNOD), v1 object headers;
  *  - coordinate variables as DIMENSION_SCALEs (CLASS/NAME attrs),
  *    data variables carrying DIMENSION_LIST (VL object references
  *    through a global heap collection) — the netCDF-4 dimension model;
  *  - contiguous layout for coordinates; chunked layout (v1 B-tree chunk
  *    index) with optional shuffle + deflate filters for data variables;
  *  - compact v1 attribute messages (units, scale/offset, _FillValue…).
  */
object H5Write {

  final case class WriteVar(
      name: String,
      dims: Seq[String],
      dtype: String, // "f8" | "f4" | "i4"
      data: Array[Double],
      attrs: Seq[(String, String)] = Seq.empty,
      numAttrs: Seq[(String, String, Array[Double])] = Seq.empty)

  // ------------------------------------------------------------ primitives

  private final class Out(val b: mutable.ArrayBuffer[Byte] = mutable.ArrayBuffer.empty) {
    def size: Int = b.length
    def u8(v: Int): this.type = { b += v.toByte; this }
    def u16(v: Int): this.type = { b += v.toByte += (v >> 8).toByte; this }
    def u32(v: Long): this.type = { (0 until 4).foreach(i => b += (v >> (8 * i)).toByte); this }
    def u64(v: Long): this.type = { (0 until 8).foreach(i => b += (v >> (8 * i)).toByte); this }
    def raw(a: Array[Byte]): this.type = { b ++= a; this }
    def pad(align: Int): this.type = { while (b.length % align != 0) b += 0; this }
    def bytes: Array[Byte] = b.toArray
  }

  private val Undef = -1L

  private def elemSize(dtype: String): Int = dtype match {
    case "f8" => 8
    case "f4" | "i4" => 4
    case other => throw new IllegalArgumentException(s"dtype $other")
  }

  private def encodeVals(dtype: String, vals: Array[Double]): Array[Byte] = {
    val out = new Out()
    dtype match {
      case "f8" => vals.foreach(v => out.u64(java.lang.Double.doubleToRawLongBits(v)))
      case "f4" => vals.foreach(v => out.u32(java.lang.Float.floatToRawIntBits(v.toFloat) & 0xFFFFFFFFL))
      case "i4" => vals.foreach(v => out.u32(v.toLong & 0xFFFFFFFFL))
    }
    out.bytes
  }

  /** Datatype message body (v1). */
  private def datatypeMsg(dtype: String): Array[Byte] = {
    val out = new Out()
    dtype match {
      case "f4" =>
        out.u8(0x11).u8(0x20).u8(0x1f).u8(0x00).u32(4)
        out.u16(0).u16(32).u8(23).u8(8).u8(0).u8(23).u32(127)
      case "f8" =>
        out.u8(0x11).u8(0x20).u8(0x3f).u8(0x00).u32(8)
        out.u16(0).u16(64).u8(52).u8(11).u8(0).u8(52).u32(1023)
      case "i4" =>
        out.u8(0x10).u8(0x08).u8(0x00).u8(0x00).u32(4)
        out.u16(0).u16(32)
    }
    out.bytes
  }

  private def stringType(len: Int): Array[Byte] =
    new Out().u8(0x13).u8(0x00).u8(0x00).u8(0x00).u32(len).bytes

  private val RefType: Array[Byte] =
    new Out().u8(0x17).u8(0x00).u8(0x00).u8(0x00).u32(8).bytes

  private val VlRefType: Array[Byte] = {
    val out = new Out().u8(0x19).u8(0x00).u8(0x00).u8(0x00).u32(16)
    out.raw(RefType).bytes
  }

  /** Dataspace message body (v1). */
  private def dataspaceMsg(dims: Seq[Int]): Array[Byte] = {
    val out = new Out().u8(1).u8(dims.length).u8(0).u8(0).u32(0)
    dims.foreach(d => out.u64(d.toLong))
    out.bytes
  }

  /** Fill message v2: fill undefined (netCDF uses the _FillValue attr). */
  private val FillMsg: Array[Byte] = Array[Byte](2, 2, 0, 0)

  /** v1 attribute message: name/datatype/dataspace 8-padded, data raw. */
  private def attrMsg(name: String, dt: Array[Byte], ds: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val nameB = (name + "\u0000").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Out()
    out.u8(1).u8(0).u16(nameB.length).u16(dt.length).u16(ds.length)
    out.raw(nameB).pad(8)
    out.raw(dt).pad(8)
    out.raw(ds).pad(8)
    out.raw(data)
    out.bytes
  }

  private def strAttr(name: String, value: String): Array[Byte] = {
    val vb = (value + "\u0000").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    attrMsg(name, stringType(vb.length), dataspaceMsg(Seq.empty), vb)
  }

  private def numAttr(name: String, dtype: String, vals: Array[Double]): Array[Byte] =
    attrMsg(name, datatypeMsg(dtype),
      if (vals.length == 1) dataspaceMsg(Seq.empty) else dataspaceMsg(Seq(vals.length)),
      encodeVals(dtype, vals))

  /** Messages → v1 object header bytes (prefix + pad + 8-padded messages). */
  private def objectHeader(msgs: Seq[(Int, Array[Byte])]): Array[Byte] = {
    val bodies = msgs.map { case (t, body) =>
      val padded = new Out().raw(body).pad(8).bytes
      (t, padded)
    }
    val total = bodies.map(_._2.length + 8).sum
    val out = new Out()
    out.u8(1).u8(0).u16(msgs.length).u32(1L).u32(total.toLong).u32(0L) // +pad to 16
    bodies.foreach { case (t, body) =>
      out.u16(t).u16(body.length).u8(0).u8(0).u8(0).u8(0)
      out.raw(body)
    }
    out.bytes
  }

  // ----------------------------------------------------- writeFile / writeTree

  /** Write one netCDF-4-classic file. Data variables are chunked along the
    * leading dimension (`chunkLead` steps per chunk, full inner extent) and
    * filtered with shuffle+deflate when `compress`. Coordinate variables
    * (`dims == Seq(name)`) become contiguous DIMENSION_SCALEs. */
  def writeFile(
      spark: SparkSession,
      path: String,
      dims: Seq[(String, Int)],
      vars: Seq[WriteVar],
      chunkLead: Int = 1,
      compress: Boolean = true,
      /** "deflate" (filter id 1, the netCDF-4 classic default) or "zstd"
        * (registered plugin id 32015, newer archives). */
      codec: String = "deflate",
      /** `nc_def_var_fletcher32`: checksum the raw chunk (filter id 3,
        * FIRST in the pipeline) before shuffle + compression. */
      fletcher: Boolean = false): Unit =
    writeTree(spark, path, Seq(GroupSpec("", dims, vars)), chunkLead,
      compress, codec, fletcher)

  /** One group's contents for [[writeTree]]: name "" is the root group,
    * anything else a direct sub-group of the root (the netCDF-4 group
    * model xarray addresses with `group=`). Dims are GROUP-LOCAL — each
    * group's variables reference its own dimension scales, the
    * self-contained shape h5netcdf/xarray round-trip. */
  final case class GroupSpec(
      name: String,
      dims: Seq[(String, Int)],
      vars: Seq[WriteVar])

  /** Write a (possibly grouped) netCDF-4 file: one symbol table per
    * group, sub-group headers linked from the root's symbol table — the
    * same old-style HDF5 1.8 layout as the flat writer ([[writeFile]] is
    * the one-root-group special case). */
  def writeTree(
      spark: SparkSession,
      path: String,
      groups: Seq[GroupSpec],
      chunkLead: Int = 1,
      compress: Boolean = true,
      codec: String = "deflate",
      fletcher: Boolean = false): Unit = {
    require(codec == "deflate" || codec == "zstd" || codec == "szip",
      s"codec $codec")
    require(!fletcher || (compress && codec != "szip"),
      "fletcher32 fixtures ride the shuffle+compressor pipeline")
    require(groups.nonEmpty, "writeTree needs at least one group")
    require(groups.map(_.name).distinct.length == groups.length,
      "duplicate group names")
    require(groups.forall(!_.name.contains("/")),
      "this fixture writer emits one level of sub-groups")
    groups.foreach(g =>
      require(g.vars.nonEmpty, s"group '${g.name}' has no variables"))
    val rootSpec = groups.find(_.name.isEmpty)
    val named = groups.filter(_.name.nonEmpty)
    rootSpec.foreach(r => require(
      r.vars.map(_.name).toSet.intersect(named.map(_.name).toSet).isEmpty,
      "a root variable and a sub-group share a name"))

    def dimLenOf(g: GroupSpec) = g.dims.toMap
    def isCoord(g: GroupSpec, v: WriteVar) =
      v.dims == Seq(v.name) && dimLenOf(g).contains(v.name)

    // ---- plan piece sizes first (addresses are all 8 bytes, so sizes are
    // address-independent), then lay out, then render with real addresses.

    final case class VarPlan(
        v: WriteVar,
        shape: Seq[Int],
        chunks: Option[Seq[Int]], // None = contiguous
        payloads: Seq[(Seq[Int], Array[Byte])]) // per chunk: grid coords + stored bytes

    def planVar(g: GroupSpec)(v: WriteVar): VarPlan = {
      val dimLen = dimLenOf(g)
      val shape = v.dims.map(d => dimLen.getOrElse(d,
        throw new IllegalArgumentException(s"${v.name}: unknown dim $d")))
      require(v.data.length == shape.product,
        s"${v.name}: ${v.data.length} values for shape $shape")
      if (isCoord(g, v) || shape.length == 0)
        VarPlan(v, shape, None, Seq((Seq.empty, encodeVals(v.dtype, v.data))))
      else {
        val lead = math.min(math.max(chunkLead, 1), shape.head)
        val chunkShape = lead +: shape.tail
        val inner = shape.tail.product
        val es = elemSize(v.dtype)
        val nChunks = (shape.head + lead - 1) / lead
        val payloads = (0 until nChunks).map { c =>
          val lo = c * lead
          val rows = math.min(lead, shape.head - lo)
          // chunks are stored FULL size; pad the tail chunk with zeros
          val cells = new Array[Double](lead * inner)
          System.arraycopy(v.data, lo * inner, cells, 0, rows * inner)
          var raw = encodeVals(v.dtype, cells)
          if (compress) {
            if (codec == "szip")
              // szip runs alone (its NN stage plays shuffle's role); the
              // client values mirror H5Z__set_local_szip: LSB samples (LE
              // data) + NN + EC, scanline = fastest chunk dim
              raw = szipCodec(es, chunkShape).encode(raw)
            else {
              // pipeline order: (fletcher32,) shuffle, then the compressor
              if (fletcher) {
                val c = graft.sources.zarr.ZarrCodec.fletcher32(raw, raw.length)
                val withSum = java.util.Arrays.copyOf(raw, raw.length + 4)
                withSum(raw.length) = (c & 0xFF).toByte
                withSum(raw.length + 1) = ((c >> 8) & 0xFF).toByte
                withSum(raw.length + 2) = ((c >> 16) & 0xFF).toByte
                withSum(raw.length + 3) = ((c >> 24) & 0xFF).toByte
                raw = withSum
              }
              raw = shuffleBytes(raw, es)
              raw = if (codec == "zstd") com.github.luben.zstd.Zstd.compress(raw, 3)
                    else deflate(raw)
            }
          }
          (Seq(c) ++ Seq.fill(shape.length - 1)(0), raw)
        }
        VarPlan(v, shape, Some(chunkShape), payloads)
      }
    }
    val plansOf: Map[String, Seq[VarPlan]] =
      groups.map(g => g.name -> g.vars.map(planVar(g))).toMap
    val dimScalesOf: Map[String, Seq[String]] = groups.map(g =>
      g.name -> plansOf(g.name).filter(p => isCoord(g, p.v)).map(_.v.name)).toMap

    // ---- allocator
    var cursor = 0L
    def alloc(n: Int): Long = { val a = cursor; cursor += n; a }

    alloc(96) // superblock v0 + root symbol table entry

    // ---- symbol-table pieces per group; the ROOT's entries are its own
    // variables plus one link per named sub-group
    val entriesOf: Seq[(String, Seq[String])] =
      ("" -> (rootSpec.toSeq.flatMap(_.vars.map(_.name)) ++
        named.map(_.name)).sorted) +:
        named.map(g => g.name -> g.vars.map(_.name).sorted)

    final case class SymTab(heapNames: Map[String, Long], heapData: Array[Byte],
        heapHdrAddr: Long, heapDataAddr: Long, btreeAddr: Long, snodAddr: Long)
    val symOf: Map[String, SymTab] = entriesOf.map { case (gname, entries) =>
      // local heap: names data (offset 0 = empty string), 8-aligned
      val heapNames = mutable.LinkedHashMap.empty[String, Long]
      val out = new Out().u8(0).pad(8)
      entries.foreach { n =>
        heapNames(n) = out.size.toLong
        out.raw((n + "\u0000").getBytes).pad(8)
      }
      val heapData = out.pad(8).bytes
      val heapHdrAddr = alloc(32)
      val heapDataAddr = alloc(heapData.length)
      val btreeAddr = alloc(24 + 2 * 16 + 8) // 1-entry group B-tree (2 keys)
      val snodAddr = alloc(8 + entries.length * 40)
      gname -> SymTab(heapNames.toMap, heapData, heapHdrAddr, heapDataAddr,
        btreeAddr, snodAddr)
    }.toMap

    // global heap per group for DIMENSION_LIST references (one object per
    // dim scale)
    val gcolSizeOf: Map[String, Int] = groups.map(g =>
      g.name -> (16 + dimScalesOf(g.name).length * (16 + 8) + 16)).toMap
    val gcolAddrOf: Map[String, Long] = groups.map(g =>
      g.name -> alloc((gcolSizeOf(g.name) + 7) / 8 * 8)).toMap

    // object headers: sizes via a dry render with placeholder addresses
    def headerMsgs(g: GroupSpec, p: VarPlan, btAddr: Long,
        dataAddr: Long): Seq[(Int, Array[Byte])] = {
      val v = p.v
      val es = elemSize(v.dtype)
      val gcol = gcolAddrOf(g.name)
      val gIdx = dimScalesOf(g.name).zipWithIndex.toMap
      val layout: Array[Byte] = p.chunks match {
        case None =>
          new Out().u8(3).u8(1)
            .u64(dataAddr)
            .u64(p.payloads.head._2.length.toLong).bytes
        case Some(cs) =>
          val out = new Out().u8(3).u8(2).u8(cs.length + 1)
            .u64(btAddr)
          cs.foreach(c => out.u32(c.toLong))
          out.u32(es.toLong).bytes
      }
      val filters: Seq[(Int, Array[Byte])] =
        if (p.chunks.isDefined && compress && codec == "szip") {
          // one-entry pipeline: filter id 4 with H5Z__set_local_szip's
          // 4 client values (mask, pixels/block, bits/pixel, pixels/scanline)
          val sz = szipCodec(es, p.chunks.get)
          val out = new Out().u8(1).u8(1).u16(0).u32(0L)
          out.u16(4).u16(0).u16(0).u16(4)
          out.u32(sz.optionsMask.toLong).u32(sz.pixelsPerBlock.toLong)
          out.u32(sz.bitsPerPixel.toLong).u32(sz.pixelsPerScanline.toLong)
          Seq((0x0B, out.bytes))
        } else if (p.chunks.isDefined && compress) {
          val out = new Out().u8(1).u8(if (fletcher) 3 else 2).u16(0).u32(0L)
          if (fletcher)
            out.u16(3).u16(0).u16(0).u16(0) // fletcher32, no client values
          out.u16(2).u16(0).u16(0).u16(1).u32(es.toLong).u32(0L) // shuffle (+pad)
          if (codec == "zstd") {
            // registered plugin id 32015; ids ≥ 256 carry a name (8-byte
            // padded in the v1 message), one client value = level
            out.u16(32015).u16(8).u16(0).u16(1)
            "zstd".getBytes("US-ASCII").foreach(b => out.u8(b & 0xFF))
            out.u8(0).u8(0).u8(0).u8(0)
            out.u32(3L).u32(0L)
          } else
            out.u16(1).u16(0).u16(0).u16(1).u32(6L).u32(0L) // deflate level 6 (+pad)
          Seq((0x0B, out.bytes))
        } else Seq.empty
      val dimAttrs: Seq[(Int, Array[Byte])] =
        if (isCoord(g, v)) Seq(
          (0x0C, strAttr("CLASS", "DIMENSION_SCALE")),
          (0x0C, strAttr("NAME", v.name)),
          (0x0C, numAttr("_Netcdf4Dimid", "i4",
            Array(g.dims.indexWhere(_._1 == v.name).toDouble))))
        else Seq((0x0C, {
          // DIMENSION_LIST: one VL element per dimension, each one object ref
          val data = new Out()
          v.dims.foreach { d =>
            data.u32(1L).u64(gcol).u32((gIdx(d) + 1).toLong)
          }
          attrMsg("DIMENSION_LIST", VlRefType, dataspaceMsg(Seq(v.dims.length)),
            data.bytes)
        }))
      val userAttrs = v.attrs.map { case (k, s) => (0x0C, strAttr(k, s)) } ++
        v.numAttrs.map { case (k, t, vals) => (0x0C, numAttr(k, t, vals)) }
      Seq(
        (0x01, dataspaceMsg(p.shape)),
        (0x03, datatypeMsg(v.dtype)),
        (0x05, FillMsg),
        (0x08, layout)) ++ filters ++ dimAttrs ++ userAttrs
    }

    val headerAddrOf: Map[(String, String), Long] = groups.flatMap { g =>
      plansOf(g.name).map { p =>
        val size = objectHeader(headerMsgs(g, p, Undef, Undef)).length
        (g.name, p.v.name) -> alloc(size)
      }
    }.toMap

    // chunk B-trees + data blobs
    val btAddrOf: Map[(String, String), Long] = groups.flatMap { g =>
      plansOf(g.name).collect {
        case p if p.chunks.isDefined =>
          val nd = p.shape.length
          val keySize = 8 + (nd + 1) * 8
          (g.name, p.v.name) ->
            alloc(24 + p.payloads.length * (keySize + 8) + keySize)
      }
    }.toMap
    val chunkAddrOf: Map[(String, String), Seq[Long]] = groups.flatMap { g =>
      plansOf(g.name).map(p => (g.name, p.v.name) ->
        p.payloads.map { case (_, bytes) => alloc(bytes.length) })
    }.toMap

    // group object headers: one symbol-table message each; root LAST (its
    // address rides the superblock)
    def symTabMsgs(st: SymTab): Seq[(Int, Array[Byte])] =
      Seq((0x11, new Out().u64(st.btreeAddr).u64(st.heapHdrAddr).bytes))
    val groupHeaderAddrOf: Map[String, Long] = named.map(g =>
      g.name -> alloc(objectHeader(symTabMsgs(symOf(g.name))).length)).toMap
    val rootAddr = alloc(objectHeader(symTabMsgs(symOf(""))).length)
    val eof = cursor

    // ---- render
    val file = new Array[Byte](eof.toInt)
    def put(addr: Long, bytes: Array[Byte]): Unit =
      System.arraycopy(bytes, 0, file, addr.toInt, bytes.length)

    // superblock v0
    val sb = new Out()
    sb.raw(H5Format.Signature)
    sb.u8(0).u8(0).u8(0).u8(0).u8(0).u8(8).u8(8).u8(0)
    sb.u16(4).u16(16).u32(0L)
    sb.u64(0L).u64(Undef).u64(eof).u64(Undef)
    sb.u64(0L).u64(rootAddr) // root symbol-table entry: name off + header addr
    sb.u32(0L).u32(0L) // cache type + reserved
    sb.u64(0L).u64(0L) // scratch
    put(0, sb.bytes)

    // symbol-table machinery per group
    entriesOf.foreach { case (gname, entries) =>
      val st = symOf(gname)
      val heap = new Out()
      heap.raw("HEAP".getBytes).u8(0).u8(0).u8(0).u8(0)
      heap.u64(st.heapData.length.toLong).u64(st.heapData.length.toLong)
        .u64(st.heapDataAddr)
      put(st.heapHdrAddr, heap.bytes)
      put(st.heapDataAddr, st.heapData)

      // group B-tree (single leaf pointing at the SNOD)
      val bt = new Out()
      bt.raw("TREE".getBytes).u8(0).u8(0).u16(1)
      bt.u64(Undef).u64(Undef)
      bt.u64(0L) // key 0: empty-string heap offset
      bt.u64(st.snodAddr)
      bt.u64(st.heapNames(entries.max)) // key 1: greatest name
      put(st.btreeAddr, bt.bytes)

      // SNOD, sorted by name; in the root, a name may link a SUB-GROUP
      val snod = new Out()
      snod.raw("SNOD".getBytes).u8(1).u8(0).u16(entries.length)
      entries.foreach { n =>
        val addr =
          if (gname.isEmpty) groupHeaderAddrOf.getOrElse(n, headerAddrOf(("", n)))
          else headerAddrOf((gname, n))
        snod.u64(st.heapNames(n)).u64(addr)
        snod.u32(0L).u32(0L)
        (0 until 16).foreach(_ => snod.u8(0))
      }
      put(st.snodAddr, snod.bytes)
    }

    groups.foreach { g =>
      // global heap: object i+1 = 8-byte header address of dim scale i
      val gcol = new Out()
      gcol.raw("GCOL".getBytes).u8(1).u8(0).u8(0).u8(0)
      gcol.u64(((gcolSizeOf(g.name) + 7) / 8 * 8).toLong)
      dimScalesOf(g.name).zipWithIndex.foreach { case (d, i) =>
        gcol.u16(i + 1).u16(1).u32(0L).u64(8L).u64(headerAddrOf((g.name, d)))
      }
      gcol.u16(0).u16(0).u32(0L).u64(0L) // terminator
      put(gcolAddrOf(g.name), gcol.bytes)

      // variable object headers
      plansOf(g.name).foreach { p =>
        val key = (g.name, p.v.name)
        put(headerAddrOf(key), objectHeader(headerMsgs(g, p,
          btAddrOf.getOrElse(key, Undef),
          if (p.chunks.isEmpty) chunkAddrOf(key).head else Undef)))
      }

      // chunk B-trees + payloads
      plansOf(g.name).foreach { p =>
        val key = (g.name, p.v.name)
        p.chunks.foreach { cs =>
          val nd = p.shape.length
          val node = new Out()
          node.raw("TREE".getBytes).u8(1).u8(0).u16(p.payloads.length)
          node.u64(Undef).u64(Undef)
          p.payloads.zipWithIndex.foreach { case ((coords, bytes), i) =>
            node.u32(bytes.length.toLong).u32(0L)
            coords.zip(cs).foreach { case (c, cdim) => node.u64(c.toLong * cdim) }
            node.u64(0L) // trailing element offset
            node.u64(chunkAddrOf(key)(i))
          }
          // final key: one past the end
          node.u32(0L).u32(0L)
          node.u64(p.shape.head.toLong)
          (1 until nd).foreach(_ => node.u64(0L))
          node.u64(0L)
          put(btAddrOf(key), node.bytes)
        }
        p.payloads.zipWithIndex.foreach { case ((_, bytes), i) =>
          put(chunkAddrOf(key)(i), bytes)
        }
      }
    }

    // sub-group + root group headers
    named.foreach(g => put(groupHeaderAddrOf(g.name),
      objectHeader(symTabMsgs(symOf(g.name)))))
    put(rootAddr, objectHeader(symTabMsgs(symOf(""))))

    // ---- flush
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(hp, true)
    try out.write(file) finally out.close()
  }


  /** Fixture szip parameters for a chunk: LSB samples (this writer emits
    * little-endian data) + NN preprocessing + entropy coding (mask
    * 8|32|4 = 44), 16-pixel blocks, scanline = the chunk's fastest dim —
    * the shape H5Z__set_local_szip derives. */
  private def szipCodec(es: Int, chunkShape: Seq[Int]): graft.sources.zarr.ZarrCodec.SzipCodec =
    graft.sources.zarr.ZarrCodec.SzipCodec(
      optionsMask = 44, pixelsPerBlock = 16, bitsPerPixel = es * 8,
      pixelsPerScanline = chunkShape.last)

  private def shuffleBytes(data: Array[Byte], es: Int): Array[Byte] = {
    if (es <= 1) return data
    val n = data.length / es
    val out = new Array[Byte](data.length)
    var b = 0
    while (b < es) {
      var i = 0
      while (i < n) { out(b * n + i) = data(i * es + b); i += 1 }
      b += 1
    }
    // trailing data.length % es bytes stay in place
    var t = n * es
    while (t < data.length) { out(t) = data(t); t += 1 }
    out
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(6)
    d.setInput(raw); d.finish()
    val bos = new java.io.ByteArrayOutputStream(math.max(64, raw.length / 4))
    val buf = new Array[Byte](8192)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    bos.toByteArray
  }
}

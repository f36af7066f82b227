package graft.sources.h5

import scala.collection.mutable

/** Minimal HDF5 reader for the netCDF-4 *classic model* profile the
  * reference recommends as its input format (transform.py:136-155 — its
  * `kerchunkify` runs kerchunk's `SingleHdf5ToZarr` over exactly these
  * files, transform.py:16).
  *
  * Parsed from the public HDF5 File Format Specification (v2/v3):
  *  - superblock v0-v3;
  *  - object headers v1 and v2 (OHDR), with continuation blocks;
  *  - old-style groups (symbol-table message → v1 B-tree + local heap) and
  *    new-style groups (compact Link messages);
  *  - DENSE attribute storage (Attribute Info → fractal heap + v2 B-tree) —
  *    netCDF-C writes every variable's attributes densely;
  *  - dataspace/datatype/fill/layout/filter-pipeline messages;
  *  - chunked data via the v1 B-tree chunk index, contiguous data, and
  *    compact data;
  *  - variable-length attribute data through the global heap (GCOL) — how
  *    netCDF-4 encodes DIMENSION_LIST references.
  *
  * Deliberately NOT parsed (fails loudly): fractal-heap *huge/tiny* heap
  * ids, v2 B-tree internal nodes (depth > 0 means thousands of attributes),
  * non-IEEE floats, szip. These are outside the netCDF-4-classic profile.
  */
object H5Format {

  /** Random access into the file: `pread(offset, length)`. */
  type PRead = (Long, Int) => Array[Byte]

  val Signature: Array[Byte] =
    Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte)

  def isHdf5(magic: Array[Byte]): Boolean =
    magic.length >= 8 && java.util.Arrays.equals(magic.take(8), Signature)

  // ------------------------------------------------------------- data model

  /** Datatype subset: class 0 fixed-point, 1 float, 3 string (fixed), 7
    * object reference, 9 variable-length. */
  final case class H5Type(cls: Int, size: Int, littleEndian: Boolean,
      signed: Boolean, base: Option[H5Type]) {
    /** numpy typestr for the kerchunk manifest. */
    def typestr: String = {
      val order = if (size == 1) "|" else if (littleEndian) "<" else ">"
      cls match {
        case 0 => s"$order${if (signed) "i" else "u"}$size"
        case 1 => s"${order}f$size"
        case other => throw new IllegalArgumentException(
          s"HDF5 datatype class $other has no array typestr")
      }
    }
  }

  sealed trait Layout
  final case class Contiguous(addr: Long, size: Long) extends Layout
  final case class Chunked(btreeAddr: Long, chunkDims: Seq[Int], elemSize: Int) extends Layout
  final case class Compact(data: Array[Byte]) extends Layout

  /** Filter pipeline entry: id 1 = deflate (client[0] = level), 2 = shuffle
    * (client[0] = element size), 3 = fletcher32. */
  final case class H5Filter(id: Int, client: Seq[Int])

  sealed trait AttrValue
  final case class AttrStr(s: String) extends AttrValue
  final case class AttrNums(v: Array[Double], isFloat: Boolean) extends AttrValue
  /** Object-reference list (absolute header addresses); how DIMENSION_LIST
    * names a variable's dimension scales. */
  final case class AttrRefs(addrs: Array[Long]) extends AttrValue
  case object AttrOpaque extends AttrValue

  final case class H5Dataset(
      name: String,
      headerAddr: Long,
      dims: Seq[Long],
      dtype: H5Type,
      layout: Layout,
      filters: Seq[H5Filter],
      fillBytes: Option[Array[Byte]],
      attrs: Map[String, AttrValue]) {
    def attrStr(n: String): Option[String] = attrs.get(n).collect {
      case AttrStr(s) => s
      case AttrNums(v, _) => v.mkString(",")
    }
    def attrNum(n: String): Option[Double] = attrs.get(n).collect {
      case AttrNums(v, _) if v.nonEmpty => v.head
    }
    def isDimScale: Boolean = attrStr("CLASS").contains("DIMENSION_SCALE")
  }

  final case class H5File(rootAttrs: Map[String, AttrValue], datasets: Seq[H5Dataset])

  // ------------------------------------------------------------ byte access

  private final class Cursor(val b: Array[Byte], var p: Int) {
    def u8(): Int = { val v = b(p) & 0xFF; p += 1; v }
    def u16(): Int = { val v = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8); p += 2; v }
    def u32(): Long = { val v = leN(b, p, 4); p += 4; v }
    def u64(): Long = { val v = leN(b, p, 8); p += 8; v }
    def uN(n: Int): Long = { val v = leN(b, p, n); p += n; v }
    def bytes(n: Int): Array[Byte] = {
      val v = java.util.Arrays.copyOfRange(b, p, p + n); p += n; v
    }
    def skip(n: Int): Unit = p += n
  }

  private def leN(b: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L
    var i = n - 1
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xFFL); i -= 1 }
    v
  }

  private val Undef = -1L // 0xFFFF.. addresses parse to -1

  // ------------------------------------------------------------- superblock

  /** Locate + parse the superblock; returns the root group header address.
    * (Superblocks may start at 0, 512, 1024, ... — netCDF-4 uses 0.) */
  private def rootAddress(read: PRead): Long = {
    val head = read(0L, 64)
    require(isHdf5(head), "not an HDF5 file (bad signature)")
    val version = head(8) & 0xFF
    version match {
      case 0 | 1 =>
        val offSize = head(13) & 0xFF
        val lenSize = head(14) & 0xFF
        require(offSize == 8 && lenSize == 8,
          s"HDF5 superblock v$version with $offSize-byte offsets unsupported (need 8)")
        // v0: sig(8) sbver(1) fsver(1) rgver(1) res(1) shver(1) offsz(1)
        // lensz(1) res(1) leafK(2) internalK(2) flags(4) [v1: +4]
        // base(8) fsaddr(8) eof(8) driver(8) root-symbol-table-entry
        val fixed = 24 + (if (version == 1) 4 else 0)
        val c = new Cursor(read(fixed.toLong, 8 * 4 + 40), 0)
        c.skip(8 * 4) // base, free-space, eof, driver-info
        // symbol table entry: link name offset(8), OBJECT HEADER ADDRESS(8)
        c.skip(8)
        c.u64()
      case 2 | 3 =>
        val offSize = head(9) & 0xFF
        require(offSize == 8, s"HDF5 superblock v$version offsets $offSize unsupported")
        // v2: sig(8) ver(1) offsz(1) lensz(1) flags(1) base(8) ext(8) eof(8) root(8)
        leN(head, 36, 8)
      case other => throw new IllegalArgumentException(s"HDF5 superblock v$other")
    }
  }

  // ---------------------------------------------------------- object header

  private final case class Msg(mtype: Int, body: Array[Byte])

  private def readObjectHeader(read: PRead, addr: Long): Seq[Msg] = {
    val head4 = read(addr, 4)
    if (head4.sameElements("OHDR".getBytes)) readOhdrV2(read, addr)
    else readOhdrV1(read, addr)
  }

  /** v1 object header: ver(1) res(1) nmsgs(2) refcount(4) size(4) pad(4). */
  private def readOhdrV1(read: PRead, addr: Long): Seq[Msg] = {
    val h = new Cursor(read(addr, 16), 0)
    val ver = h.u8()
    require(ver == 1, s"object header version $ver at $addr")
    h.skip(1)
    val nmsgs = h.u16()
    h.skip(4)
    val size = h.u32().toInt
    val msgs = mutable.ArrayBuffer.empty[Msg]
    var remaining = nmsgs
    // message block starts after 12-byte header padded to 16
    var blocks = List((addr + 16, size))
    while (blocks.nonEmpty && remaining > 0) {
      val (bAddr, bSize) = blocks.head
      blocks = blocks.tail
      val c = new Cursor(read(bAddr, bSize), 0)
      while (remaining > 0 && c.p + 8 <= bSize) {
        val mtype = c.u16()
        val msize = c.u16()
        c.skip(4) // flags + reserved
        val body = c.bytes(msize)
        remaining -= 1
        if (mtype == 0x10) { // continuation: offset(8) length(8)
          val cc = new Cursor(body, 0)
          blocks = (cc.u64(), cc.u64().toInt) :: blocks
        } else msgs += Msg(mtype, body)
      }
    }
    msgs.toSeq
  }

  /** v2 object header (OHDR): flags decide which optional fields appear;
    * messages carry 1-byte type. Continuations are OCHK blocks. */
  private def readOhdrV2(read: PRead, addr: Long): Seq[Msg] = {
    val h = new Cursor(read(addr, 16), 0)
    h.skip(4) // OHDR
    val ver = h.u8()
    require(ver == 2, s"OHDR version $ver")
    val flags = h.u8()
    if ((flags & 0x20) != 0) h.skip(16) // times (4×4)
    if ((flags & 0x10) != 0) h.skip(4) // max compact/dense attrs
    val sizeBytes = 1 << (flags & 0x3)
    val headerLen = h.p + sizeBytes
    val size = new Cursor(read(addr + h.p, sizeBytes), 0).uN(sizeBytes).toInt
    val msgs = mutable.ArrayBuffer.empty[Msg]
    val trackOrder = (flags & 0x4) != 0

    def block(bAddr: Long, bSize: Int): Unit = {
      val c = new Cursor(read(bAddr, bSize), 0)
      // a message header is ≥4 bytes (+2 if creation order tracked); the
      // final ≤3 bytes of a block are gap padding
      val minHdr = 4 + (if (trackOrder) 2 else 0)
      while (c.p + minHdr <= bSize) {
        val mtype = c.u8()
        val msize = c.u16()
        c.skip(1) // flags
        if (trackOrder) c.skip(2)
        val body = c.bytes(msize)
        if (mtype == 0x10) { // continuation → OCHK block (sig + msgs + cksum)
          val cc = new Cursor(body, 0)
          val ca = cc.u64()
          val cl = cc.u64().toInt
          val sig = read(ca, 4)
          require(sig.sameElements("OCHK".getBytes), s"bad continuation at $ca")
          block(ca + 4, cl - 8) // minus signature + trailing checksum
        } else msgs += Msg(mtype, body)
      }
    }
    block(addr + headerLen, size)
    msgs.toSeq
  }

  // ------------------------------------------------------- message decoding

  private def parseDataspace(b: Array[Byte]): Seq[Long] = {
    val c = new Cursor(b, 0)
    val ver = c.u8()
    val nd = c.u8()
    ver match {
      case 1 => c.skip(6) // flags + reserved(5)
      case 2 => c.skip(2) // flags + type
      case other => throw new IllegalArgumentException(s"dataspace v$other")
    }
    (0 until nd).map(_ => c.u64())
  }

  private def parseDatatype(b: Array[Byte]): H5Type = {
    val c = new Cursor(b, 0)
    val classAndVer = c.u8()
    val cls = classAndVer & 0xF
    val bits0 = c.u8(); c.skip(2) // bit fields 8-23
    val size = c.u32().toInt
    cls match {
      case 0 => // fixed-point: bit0 order, bit3 signed
        H5Type(0, size, littleEndian = (bits0 & 0x1) == 0,
          signed = (bits0 & 0x8) != 0, base = None)
      case 1 =>
        H5Type(1, size, littleEndian = (bits0 & 0x1) == 0, signed = true, base = None)
      case 3 => H5Type(3, size, littleEndian = true, signed = false, base = None)
      // compound (6): REFERENCE_LIST etc — carried opaquely, never decoded
      case 6 => H5Type(6, size, littleEndian = true, signed = false, base = None)
      case 7 => H5Type(7, size, littleEndian = true, signed = false, base = None)
      case 9 =>
        // properties: base datatype follows the 8-byte prefix
        val base = parseDatatype(java.util.Arrays.copyOfRange(b, 8, b.length))
        H5Type(9, size, littleEndian = true, signed = false, base = Some(base))
      case other => throw new IllegalArgumentException(
        s"HDF5 datatype class $other unsupported (netCDF-4 classic profile)")
    }
  }

  /** Fill value message (v2/v3): Some(bytes) only when a fill is defined. */
  private def parseFill(b: Array[Byte]): Option[Array[Byte]] = {
    val c = new Cursor(b, 0)
    val ver = c.u8()
    ver match {
      case 1 | 2 =>
        c.skip(2) // alloc + write time
        val defined = c.u8()
        if (ver == 1 || defined == 1) {
          val n = c.u32().toInt
          if (n > 0) Some(c.bytes(n)) else None
        } else None
      case 3 =>
        val flags = c.u8()
        if ((flags & 0x20) != 0) { val n = c.u32().toInt; Some(c.bytes(n)) }
        else None
      case other => throw new IllegalArgumentException(s"fill message v$other")
    }
  }

  private def parseLayout(b: Array[Byte]): Layout = {
    val c = new Cursor(b, 0)
    val ver = c.u8()
    ver match {
      case 3 =>
        c.u8() match {
          case 0 =>
            val n = c.u16()
            Compact(c.bytes(n))
          case 1 =>
            Contiguous(c.u64(), c.u64())
          case 2 =>
            val ndp1 = c.u8()
            val bt = c.u64()
            val dims = (0 until ndp1).map(_ => c.u32().toInt)
            Chunked(bt, dims.dropRight(1), dims.last)
          case other => throw new IllegalArgumentException(s"layout class $other")
        }
      case 1 | 2 =>
        // v1/2: ndims(1) class(1) res(5) [addr] dims... [elemsize] [compact size+data]
        val ndp1 = c.u8()
        val cls = c.u8()
        c.skip(5)
        cls match {
          case 1 =>
            val addr = c.u64()
            val dims = (0 until ndp1).map(_ => c.u32().toInt)
            Contiguous(addr, dims.map(_.toLong).product)
          case 2 =>
            val addr = c.u64()
            val dims = (0 until ndp1).map(_ => c.u32().toInt)
            Chunked(addr, dims.dropRight(1), dims.last)
          case 0 =>
            (0 until ndp1).foreach(_ => c.u32())
            val n = c.u32().toInt
            Compact(c.bytes(n))
          case other => throw new IllegalArgumentException(s"layout v$ver class $other")
        }
      case other => throw new IllegalArgumentException(s"layout message v$other")
    }
  }

  private def parseFilters(b: Array[Byte]): Seq[H5Filter] = {
    val c = new Cursor(b, 0)
    val ver = c.u8()
    val n = c.u8()
    if (ver == 1) c.skip(6) else ()
    (0 until n).map { _ =>
      val id = c.u16()
      val nameLen = if (ver == 1 || id >= 256) c.u16() else 0
      val flags = c.u16()
      val nclient = c.u16()
      if (nameLen > 0) c.skip(if (ver == 1) (nameLen + 7) / 8 * 8 else nameLen)
      val client = (0 until nclient).map(_ => c.u32().toInt)
      // v1 pads client data to even count
      if (ver == 1 && nclient % 2 == 1) c.skip(4)
      val _ = flags
      H5Filter(id, client)
    }
  }

  // -------------------------------------------------------------- attributes

  /** Attribute message (v1/v2/v3) → (name, decoded value). */
  private def parseAttribute(read: PRead, b: Array[Byte]): (String, AttrValue) = {
    val c = new Cursor(b, 0)
    val ver = c.u8()
    c.skip(1) // reserved (v1) / flags (v2/3)
    val nameLen = c.u16()
    val dtLen = c.u16()
    val dsLen = c.u16()
    if (ver == 3) c.skip(1) // name character-set encoding
    require(ver >= 1 && ver <= 3, s"attribute message v$ver")
    def padded(len: Int): Int = if (ver == 1) (len + 7) / 8 * 8 else len
    val name = new String(c.bytes(nameLen), java.nio.charset.StandardCharsets.UTF_8)
      .takeWhile(_ != '\u0000')
    c.skip(padded(nameLen) - nameLen)
    val dt = parseDatatype(c.bytes(dtLen))
    c.skip(padded(dtLen) - dtLen)
    val dims = parseDataspace(c.bytes(dsLen))
    c.skip(padded(dsLen) - dsLen)
    val n = if (dims.isEmpty) 1L else dims.product
    val value = decodeAttrData(read, dt, n.toInt, c)
    (name, value)
  }

  private def decodeAttrData(read: PRead, dt: H5Type, n: Int, c: Cursor): AttrValue =
    dt.cls match {
      case 3 =>
        AttrStr(new String(c.bytes(dt.size * n),
          java.nio.charset.StandardCharsets.UTF_8).takeWhile(_ != '\u0000'))
      case 0 =>
        AttrNums(Array.tabulate(n) { i =>
          val raw = c.bytes(dt.size)
          val v = if (dt.littleEndian) leN(raw, 0, dt.size)
            else { val r = raw.reverse; leN(r, 0, dt.size) }
          if (dt.signed) {
            val shift = 64 - dt.size * 8
            ((v << shift) >> shift).toDouble
          } else v.toDouble
        }, isFloat = false)
      case 1 =>
        AttrNums(Array.tabulate(n) { i =>
          val raw0 = c.bytes(dt.size)
          val raw = if (dt.littleEndian) raw0 else raw0.reverse
          if (dt.size == 4) java.lang.Float.intBitsToFloat(leN(raw, 0, 4).toInt).toDouble
          else java.lang.Double.longBitsToDouble(leN(raw, 0, 8))
        }, isFloat = true)
      case 7 =>
        AttrRefs(Array.tabulate(n)(_ => c.u64()))
      case 9 if dt.base.exists(_.cls == 7) =>
        // VL sequence of object references: per element
        // {nelems(4), gheap addr(8), gheap index(4)} → global heap object
        AttrRefs(Array.tabulate(n) { _ =>
          val nelems = c.u32().toInt
          val gaddr = c.u64()
          val gidx = c.u32().toInt
          require(nelems == 1,
            s"DIMENSION_LIST entry with $nelems references (expected 1 per dim)")
          leN(globalHeapObject(read, gaddr, gidx), 0, 8)
        })
      case _ => AttrOpaque
    }

  /** Global heap collection (GCOL): objects prefixed idx(2) ref(2) res(4)
    * size(8), data 8-aligned. */
  private def globalHeapObject(read: PRead, addr: Long, index: Int): Array[Byte] = {
    val head = new Cursor(read(addr, 16), 0)
    require(head.bytes(4).sameElements("GCOL".getBytes), s"no GCOL at $addr")
    head.skip(4) // version + reserved
    val size = head.u64().toInt
    val c = new Cursor(read(addr, size), 16)
    while (c.p + 16 <= size) {
      val idx = c.u16()
      c.skip(6)
      val objSize = c.u64().toInt
      if (idx == index) return c.bytes(objSize)
      if (idx == 0) throw new NoSuchElementException(s"gheap $addr has no index $index")
      c.skip((objSize + 7) / 8 * 8)
    }
    throw new NoSuchElementException(s"gheap $addr has no index $index")
  }

  // ------------------------------------- dense attributes (fractal heap)

  private final case class FractalHeap(idLen: Int, flags: Int, maxDirect: Long,
      offSize: Int, lenSize: Int, rootAddr: Long, curRows: Int, width: Int,
      startBlock: Long)

  private def parseFractalHeap(read: PRead, addr: Long): FractalHeap = {
    val c = new Cursor(read(addr, 160), 0)
    require(c.bytes(4).sameElements("FRHP".getBytes), s"no FRHP at $addr")
    c.skip(1) // version
    val idLen = c.u16()
    c.skip(2) // io filter encoded length
    val flags = c.u8()
    c.skip(4) // max managed object size
    c.skip(8 * 12) // next-huge … ntiny (12 × 8-byte fields)
    val width = c.u16()
    val startBlock = c.u64()
    val maxDirect = c.u64()
    val maxHeapBits = c.u16()
    c.skip(2) // starting # rows
    val rootAddr = c.u64()
    val curRows = c.u16()
    val offSize = (maxHeapBits + 7) / 8
    // length field width = min bytes holding the max direct block SIZE value
    val lenSize = (64 - java.lang.Long.numberOfLeadingZeros(maxDirect) + 7) / 8
    FractalHeap(idLen, flags, maxDirect, offSize, lenSize, rootAddr, curRows,
      width, startBlock)
  }

  /** Fetch a managed object given its heap offset: heap offsets address the
    * heap's linear space, which INCLUDES block headers, so within a direct
    * block the object lives at `blockAddr + (offset - blockOffset)`. */
  private def fractalHeapBytes(read: PRead, h: FractalHeap, offset: Long,
      length: Int): Array[Byte] = {
    if (h.curRows == 0) {
      // root IS a direct block with block offset 0
      read(h.rootAddr + offset, length)
    } else {
      // root indirect block (FHIB): child direct blocks in doubling-table
      // order; row 0 and 1 use startBlock size, row n doubles
      val header = new Cursor(read(h.rootAddr, 32 + h.offSize), 0)
      require(header.bytes(4).sameElements("FHIB".getBytes),
        s"no FHIB at ${h.rootAddr}")
      header.skip(1 + 8) // version + heap header address
      header.skip(h.offSize) // block offset of this indirect block (root: 0)
      val entries = mutable.ArrayBuffer.empty[(Long, Long)] // (blockOffset, addr)
      var running = 0L
      val body = new Cursor(
        read(h.rootAddr + header.p, h.curRows * h.width * 8), 0)
      var row = 0
      while (row < h.curRows) {
        val rowSize = if (row < 2) h.startBlock else h.startBlock << (row - 1)
        var col = 0
        while (col < h.width) {
          val addr = body.u64()
          if (addr != Undef) entries += ((running, addr))
          running += rowSize
          col += 1
        }
        row += 1
      }
      // find the direct block containing `offset`
      val rows = entries.toSeq
      val idx = rows.lastIndexWhere(_._1 <= offset)
      require(idx >= 0, s"fractal heap offset $offset before first block")
      val (blockOff, addr) = rows(idx)
      read(addr + (offset - blockOff), length)
    }
  }

  /** Read every record of a LEAF-only v2 B-tree (depth 0). Dense attribute
    * counts in netCDF files fit one leaf; refuse deeper trees loudly. */
  private def btree2Records(read: PRead, addr: Long): Seq[Array[Byte]] = {
    val c = new Cursor(read(addr, 38), 0)
    require(c.bytes(4).sameElements("BTHD".getBytes), s"no BTHD at $addr")
    c.skip(1 + 1 + 4) // version, type, node size
    val recSize = c.u16()
    val depth = c.u16()
    require(depth == 0,
      s"v2 B-tree depth $depth unsupported (netCDF-4 attribute counts fit a leaf)")
    c.skip(2) // split/merge percents
    val rootAddr = c.u64()
    val nRec = c.u16()
    val leaf = new Cursor(read(rootAddr, 6 + nRec * recSize), 0)
    require(leaf.bytes(4).sameElements("BTLF".getBytes), s"no BTLF at $rootAddr")
    leaf.skip(2) // version + type
    (0 until nRec).map(_ => leaf.bytes(recSize))
  }

  /** Dense attribute storage: AttrInfo message → name-index v2 B-tree
    * (record type 8: heap id(8) flags(1) corder(4) hash(4)) → fractal heap
    * objects, each one an attribute message. */
  private def denseAttrs(read: PRead, body: Array[Byte]): Seq[(String, AttrValue)] = {
    val c = new Cursor(body, 0)
    c.skip(1)
    val flags = c.u8()
    if ((flags & 0x1) != 0) c.skip(2) // max creation index
    val fheapAddr = c.u64()
    val nameBtAddr = c.u64()
    if (fheapAddr == Undef || nameBtAddr == Undef) return Seq.empty
    val heap = parseFractalHeap(read, fheapAddr)
    btree2Records(read, nameBtAddr).map { rec =>
      val idVer = rec(0) & 0xFF
      require((idVer & 0x30) == 0,
        s"huge/tiny fractal heap object (id type ${(idVer >> 4) & 0x3}) unsupported")
      val off = leN(rec, 1, heap.offSize)
      val len = leN(rec, 1 + heap.offSize, heap.lenSize).toInt
      parseAttribute(read, fractalHeapBytes(read, heap, off, len))
    }
  }

  // ------------------------------------------------------------- group walk

  /** Links out of a group header: new-style compact Link messages or
    * old-style symbol table (v1 B-tree + local heap). */
  private def groupLinks(read: PRead, msgs: Seq[Msg]): Seq[(String, Long)] = {
    val compact = msgs.filter(_.mtype == 0x06).map { m =>
      val c = new Cursor(m.body, 0)
      c.skip(1) // version
      val flags = c.u8()
      val linkType = if ((flags & 0x8) != 0) c.u8() else 0
      if ((flags & 0x4) != 0) c.skip(8) // creation order
      if ((flags & 0x10) != 0) c.skip(1) // charset
      val nameLen = c.uN(1 << (flags & 0x3)).toInt
      val name = new String(c.bytes(nameLen), java.nio.charset.StandardCharsets.UTF_8)
      require(linkType == 0, s"link '$name' type $linkType (only hard links)")
      (name, c.u64())
    }
    if (compact.nonEmpty) compact
    else msgs.find(_.mtype == 0x11) match {
      case Some(st) =>
        val c = new Cursor(st.body, 0)
        symbolTableLinks(read, c.u64(), c.u64())
      case None =>
        // new-style dense links (fractal heap) — Link Info message
        msgs.find(_.mtype == 0x02).map { li =>
          val c = new Cursor(li.body, 0)
          c.skip(1)
          val flags = c.u8()
          if ((flags & 0x1) != 0) c.skip(8)
          val fheapAddr = c.u64()
          val nameBt = c.u64()
          if (fheapAddr == Undef) Seq.empty
          else {
            val heap = parseFractalHeap(read, fheapAddr)
            // record type 5: hash(4) + heap id(7)
            btree2Records(read, nameBt).map { rec =>
              val off = leN(rec, 4 + 1, heap.offSize)
              val len = leN(rec, 4 + 1 + heap.offSize, heap.lenSize).toInt
              val link = fractalHeapBytes(read, heap, off, len)
              val lc = new Cursor(link, 0)
              lc.skip(1)
              val lflags = lc.u8()
              if ((lflags & 0x8) != 0) lc.skip(1)
              if ((lflags & 0x4) != 0) lc.skip(8)
              if ((lflags & 0x10) != 0) lc.skip(1)
              val nameLen = lc.uN(1 << (lflags & 0x3)).toInt
              val name = new String(lc.bytes(nameLen),
                java.nio.charset.StandardCharsets.UTF_8)
              (name, lc.u64())
            }
          }
        }.getOrElse(Seq.empty)
    }
  }

  /** Old-style group: v1 B-tree (node type 0) over SNOD symbol nodes, names
    * in the local heap. */
  private def symbolTableLinks(read: PRead, btAddr: Long, heapAddr: Long): Seq[(String, Long)] = {
    val hp = new Cursor(read(heapAddr, 32), 0)
    require(hp.bytes(4).sameElements("HEAP".getBytes), s"no local HEAP at $heapAddr")
    hp.skip(4) // version + reserved
    hp.skip(8 + 8) // data size, free-list head
    val heapData = hp.u64()
    def name(off: Long): String = {
      val raw = read(heapData + off, 256)
      val n = raw.indexOf(0: Byte)
      new String(raw, 0, if (n < 0) raw.length else n,
        java.nio.charset.StandardCharsets.UTF_8)
    }
    val out = mutable.ArrayBuffer.empty[(String, Long)]
    def walk(addr: Long): Unit = {
      val sig = read(addr, 4)
      if (sig.sameElements("TREE".getBytes)) {
        val c = new Cursor(read(addr, 4096), 4)
        val nodeType = c.u8()
        require(nodeType == 0, s"group B-tree node type $nodeType")
        val level = c.u8()
        val n = c.u16()
        c.skip(16) // siblings
        // keys and children interleave: key0 child0 key1 child1 … keyN
        c.skip(8) // key 0
        (0 until n).foreach { _ =>
          val child = c.u64()
          c.skip(8) // next key
          walk(child)
        }
        val _ = level
      } else if (sig.sameElements("SNOD".getBytes)) {
        val c = new Cursor(read(addr, 8), 4)
        c.skip(2)
        val n = c.u16()
        val entries = new Cursor(read(addr + 8, n * 40), 0)
        (0 until n).foreach { _ =>
          val nameOff = entries.u64()
          val objAddr = entries.u64()
          entries.skip(24) // cache type + reserved + scratch
          out += ((name(nameOff), objAddr))
        }
      } else throw new IllegalArgumentException(
        s"unexpected signature ${new String(sig)} in symbol table at $addr")
    }
    walk(btAddr)
    out.toSeq
  }

  // ------------------------------------------------------------- public API

  /** A child without a layout message (0x08) is a sub-GROUP (symbol
    * table / link messages) or a committed datatype. */
  private def isGroupHeader(mtypes: Seq[Int]): Boolean =
    !mtypes.contains(0x08) &&
      mtypes.exists(t => t == 0x11 || t == 0x02 || t == 0x06)

  /** Parse the netCDF-4-classic structure: attributes + every dataset of
    * ONE group — the root by default, or the `group` selected by
    * slash-separated path (xarray's `group=` addressing: each group is
    * its own self-contained dataset).
    *
    * Sub-groups below the SELECTED group refuse by name: silently
    * scanning only the selected level would drop the grouped variables,
    * the one failure mode worse than a refusal. */
  def parse(read: PRead, group: Option[String] = None): H5File = {
    var addr = rootAddress(read)
    var msgs = readObjectHeader(read, addr)
    var prefix = ""
    group.toSeq.flatMap(_.split('/')).filter(_.nonEmpty).foreach { comp =>
      val links = groupLinks(read, msgs)
      val next = links.collectFirst { case (n, a) if n == comp => a }
        .getOrElse(throw new IllegalArgumentException(
          s"group '$prefix$comp' not found — children of " +
            s"'/${prefix.stripSuffix("/")}': " +
            links.map(_._1).sorted.mkString(", ")))
      val childMsgs = readObjectHeader(read, next)
      require(isGroupHeader(childMsgs.map(_.mtype)),
        s"'$prefix$comp' is a dataset, not a group — drop it from the " +
          "group= path")
      addr = next; msgs = childMsgs; prefix += comp + "/"
    }
    val groupAttrs = allAttrs(read, msgs)
    val links = groupLinks(read, msgs)
    val children = links.map { case (name, a) =>
      (name, a, readObjectHeader(read, a))
    }
    val subGroups = children.collect {
      case (name, _, ms) if isGroupHeader(ms.map(_.mtype)) => name
    }
    if (subGroups.nonEmpty) {
      val where = if (prefix.isEmpty) "the root group" else s"group '$prefix'"
      throw new IllegalArgumentException(
        s"$where holds sub-group(s) " +
          subGroups.sorted.map(g => s"'$prefix$g'").mkString(", ") +
          " — grouped netCDF-4 files scan ONE group at a time; select " +
          "one with .option(\"group\", \"<path>\") (scanning only this " +
          "level would silently drop the grouped variables)")
    }
    val datasets = children.map { case (name, dsAddr, dsMsgs) =>
      val layoutMsg = dsMsgs.find(_.mtype == 0x08).getOrElse(
        throw new IllegalArgumentException(
          s"child '$prefix$name' is a committed datatype (or other " +
            "non-dataset object) — outside the netCDF-4 model this " +
            "scan implements"))
      val dims = dsMsgs.find(_.mtype == 0x01).map(m => parseDataspace(m.body))
        .getOrElse(Seq.empty)
      val dtype = parseDatatype(dsMsgs.find(_.mtype == 0x03).getOrElse(
        throw new IllegalArgumentException(s"$name: no datatype message")).body)
      val filters = dsMsgs.find(_.mtype == 0x0B).map(m => parseFilters(m.body))
        .getOrElse(Seq.empty)
      val fill = dsMsgs.find(_.mtype == 0x05).flatMap(m => parseFill(m.body))
      H5Dataset(name, dsAddr, dims, dtype, parseLayout(layoutMsg.body),
        filters, fill, allAttrs(read, dsMsgs).toMap)
    }
    H5File(groupAttrs.toMap, datasets)
  }

  private def allAttrs(read: PRead, msgs: Seq[Msg]): Seq[(String, AttrValue)] =
    msgs.filter(_.mtype == 0x0C).map(m => parseAttribute(read, m.body)) ++
      msgs.filter(_.mtype == 0x15).flatMap(m => denseAttrs(read, m.body))

  /** Enumerate a chunked dataset's stored chunks from its v1 B-tree index:
    * (grid coords, file offset, stored bytes, filter mask). */
  def chunkIndex(read: PRead, ds: H5Dataset): Seq[(Seq[Int], Long, Long, Int)] = {
    val Chunked(btAddr, chunkDims, _) = (ds.layout: @unchecked)
    val nd = chunkDims.length
    val out = mutable.ArrayBuffer.empty[(Seq[Int], Long, Long, Int)]
    def node(addr: Long): Unit = {
      if (addr == Undef) return
      val keySize = 8 + (nd + 1) * 8
      val head = new Cursor(read(addr, 24), 0)
      require(head.bytes(4).sameElements("TREE".getBytes), s"no TREE at $addr")
      val nodeType = head.u8()
      require(nodeType == 1, s"chunk B-tree node type $nodeType")
      val level = head.u8()
      val n = head.u16()
      val c = new Cursor(read(addr + 24, n * (keySize + 8) + keySize), 0)
      (0 until n).foreach { _ =>
        val size = c.u32()
        val fmask = c.u32().toInt
        val offs = (0 to nd).map(_ => c.u64()) // includes trailing elem offset
        val child = c.u64()
        if (level == 0)
          out += ((offs.dropRight(1).zip(chunkDims).map { case (o, cd) =>
            (o / cd).toInt
          }, child, size, fmask))
        else node(child)
      }
    }
    node(btAddr)
    out.toSeq
  }
}

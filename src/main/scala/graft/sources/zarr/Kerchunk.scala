package graft.sources.zarr

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}

import graft.meta.{JArr, JNum, JObj, JStr, JValue}
import graft.sources.nc.NcFormat
import graft.sources.nc.NcFormat.{NcHeader, NcVar}

/** Kerchunk reference-manifest generation: index a classic NetCDF file's
  * byte layout as zarr chunk references WITHOUT copying any data — the
  * reference's `kerchunkify` (transform.py:119-279) and multi-file
  * `MultiZarrToZarr` combine (transform.py:84-117), which together form its
  * entire scan substrate. The manifest feeds the `kerchunk` DSv2 scan,
  * whose chunk pruning then turns predicates into byte-range skips over the
  * ORIGINAL archive file (S7/S11's real form).
  *
  * Layout mapping (the same one kerchunk's netCDF3 backend uses):
  *  - a FIXED variable is one chunk covering its whole extent at `begin`;
  *  - a RECORD variable is one chunk per record — shape (1, inner...) at
  *    `begin + r * recSize` (records interleave all record variables, so
  *    per-record slabs are the only contiguous runs);
  *  - NC attrs pass through to `.zattrs` verbatim (scale/offset/_FillValue
  *    keep CF mask_and_scale semantics at scan time, like the reference's
  *    decode_cf view);
  *  - NC is big-endian, so dtypes render as `>i4` / `>f8` etc.
  */
object Kerchunk {

  private def zdtype(ncType: Int): String = ncType match {
    case NcFormat.NcByte => "|i1"
    case NcFormat.NcShort => ">i2"
    case NcFormat.NcInt => ">i4"
    case NcFormat.NcFloat => ">f4"
    case NcFormat.NcDouble => ">f8"
    case other => throw new IllegalArgumentException(s"nc_type $other not mappable")
  }

  private def attrsJson(v: NcVar, dimNames: Seq[String]): JObj = {
    val base = Seq[(String, JValue)](
      "_ARRAY_DIMENSIONS" -> JArr(dimNames.map(JStr(_))))
    val passed = v.attrs.toSeq.sortBy(_._1).map { case (name, a) =>
      name -> (a.text match {
        case Some(t) => JStr(t): JValue
        case None => a.nums match {
          case Some(ns) if ns.length == 1 => JNum(ns.head)
          case Some(ns) => JArr(ns.map(n => JNum(n)))
          case None => JStr("")
        }
      })
    }
    JObj(base ++ passed)
  }

  /** Build the refs entries for one NetCDF file. Exposed for combine. */
  private def fileEntries(conf: Configuration, path: String): (NcHeader, Seq[(String, JValue)]) = {
    val p = new HPath(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val header = try NcFormat.parseHeader(in) finally in.close()
    val entries = header.vars.flatMap { v =>
      val dimNames = v.dimIds.map(header.dims(_).name)
      val shape = v.dimIds.map(header.dims(_).length)
      val isRec = header.isRecordVar(v)
      val chunks = if (isRec) 1 +: shape.drop(1) else shape
      val zarray = JObj(Seq(
        "chunks" -> JArr(chunks.map(c => JNum(c))),
        "compressor" -> graft.meta.JNull,
        "dtype" -> JStr(zdtype(v.ncType)),
        "fill_value" -> v.fillValue.map(f => JNum(f): JValue).getOrElse(graft.meta.JNull),
        "filters" -> graft.meta.JNull,
        "order" -> JStr("C"),
        "shape" -> JArr(shape.map(s => JNum(s))),
        "zarr_format" -> JNum(2)))
      val metaEntries = Seq[(String, JValue)](
        s"${v.name}/.zarray" -> JStr(zarray.render),
        s"${v.name}/.zattrs" -> JStr(attrsJson(v, dimNames).render))
      val chunkEntries: Seq[(String, JValue)] =
        if (isRec) {
          val perRec = header.perRecordSize(v)
          val nRec = header.dims(header.recDimId).length
          val innerZeros = Seq.fill(shape.length - 1)("0")
          (0 until nRec).map { r =>
            val key = (r.toString +: innerZeros).mkString(".")
            s"${v.name}/$key" -> (JArr(Seq(JStr(path),
              JNum(v.begin + r * header.recSize), JNum(perRec))): JValue)
          }
        } else {
          val key = Seq.fill(shape.length)("0").mkString(".")
          Seq(s"${v.name}/$key" -> (JArr(Seq(JStr(path), JNum(v.begin),
            JNum(header.fixedSize(v)))): JValue))
        }
      metaEntries ++ chunkEntries
    }
    val rootAttrs = JObj(header.gattrs.toSeq.sortBy(_._1).map { case (k, a) =>
      k -> (JStr(a.asText): JValue)
    })
    (header, Seq[(String, JValue)](
      ".zgroup" -> JStr(JObj(Seq("zarr_format" -> JNum(2))).render),
      ".zattrs" -> JStr(rootAttrs.render)) ++ entries)
  }

  /** Kerchunk manifest for ONE NetCDF file. */
  def fromNetcdf(conf: Configuration, path: String): JObj = {
    val (_, entries) = fileEntries(conf, path)
    JObj(Seq("version" -> JNum(1), "refs" -> JObj(entries)))
  }

  /** Multi-file combine along the record dimension — `MultiZarrToZarr`
    * (transform.py:84-117): shapes add along the record axis, record-var
    * chunk keys renumber with the running offset, and every file must
    * present identical non-record dims (S10's identical-dims assertion).
    * Files are combined in the given order (the caller natural-sorts, the
    * manifest convention). */
  def combineNetcdf(conf: Configuration, paths: Seq[String]): JObj = {
    require(paths.nonEmpty, "combine needs at least one file")
    val parsed = paths.map(p => (p, fileEntries(conf, p)))
    val (_, (firstHeader, firstEntries)) = parsed.head
    val recDim = firstHeader.recDimId
    require(recDim >= 0, s"${paths.head} has no record dimension to combine along")
    val recName = firstHeader.dims(recDim).name
    parsed.tail.foreach { case (p, (h, _)) =>
      require(h.dims.map(d => (d.name, d.isRecord)) ==
        firstHeader.dims.map(d => (d.name, d.isRecord)),
        s"$p dims differ from ${paths.head}")
      h.dims.zip(firstHeader.dims).foreach { case (d, f) =>
        require(d.isRecord || d.length == f.length,
          s"$p: fixed dim ${d.name} length ${d.length} != ${f.length} (identical-dims)")
      }
    }
    val totalRecs = parsed.map(_._2._1.dims(recDim).length).sum

    // start from the first file's entries; fixed vars and metadata come
    // from it, record-var chunk keys from every file with offsets
    var recOffset = 0
    val out = scala.collection.mutable.LinkedHashMap.empty[String, JValue]
    parsed.zipWithIndex.foreach { case ((path, (header, entries)), fileIdx) =>
      val recVars = header.vars.filter(header.isRecordVar).map(_.name).toSet
      entries.foreach { case (key, value) =>
        val varName = key.takeWhile(_ != '/')
        val rest = key.stripPrefix(s"$varName/")
        if (key == ".zgroup" || key == ".zattrs") {
          if (fileIdx == 0) out(key) = value
        } else if (rest.startsWith(".")) {
          // metadata: first file wins, but record-var shapes must total
          if (fileIdx == 0) {
            if (rest == ".zarray" && recVars(varName)) {
              val doc = JValue.parse(value.asInstanceOf[JStr].s).asInstanceOf[JObj]
              val shape = doc.get("shape").get.asInstanceOf[JArr].items
                .map(_.asInstanceOf[JNum].n.toInt)
              val newShape = totalRecs +: shape.drop(1)
              out(key) = JStr(doc.updated("shape",
                JArr(newShape.map(s => JNum(s)))).render)
            } else out(key) = value
          }
        } else if (recVars(varName)) {
          // renumber the record (leading) chunk index
          val coords = rest.split('.')
          val renumbered = ((coords.head.toInt + recOffset).toString +: coords.tail)
            .mkString(".")
          out(s"$varName/$renumbered") = value
        } else if (fileIdx == 0) {
          out(key) = value // fixed-var chunks from the first file
        }
      }
      recOffset += header.dims(recDim).length
    }
    require(out.contains(s"$recName/.zarray") || firstHeader.vars.forall(_.name != recName),
      s"combine: record coordinate $recName lost")
    JObj(Seq("version" -> JNum(1), "refs" -> JObj(out.toSeq)))
  }

  /** Write a manifest where the scan expects it. */
  def writeManifest(conf: Configuration, manifest: JObj, outPath: String): Unit =
    ZarrIO.writeUtf8(conf, outPath, manifest.render)
}

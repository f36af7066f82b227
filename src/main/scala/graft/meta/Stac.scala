package graft.meta

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.SparkSession

import graft.model.DatasetDescriptor
import graft.store.GridStore

/** STAC catalog/collection/item publication (SURVEY §2.7 W9;
  * metadata.py:271-666, store.py:398-686): a root catalog created once,
  * collections whose bbox/interval union-extend on every update, items built
  * from store attrs, and history-preserving pushes (the old item is copied
  * aside before overwrite). All documents live under the store tree via the
  * Hadoop FS API, so file:// and s3a:// behave identically.
  */
final class StacCatalog(spark: SparkSession, rootPath: String) {

  private def fs = GridStore.fileSystem(spark, rootPath)

  private def write(path: String, doc: JValue): Unit = {
    val out = fs.create(new HPath(path), true)
    try out.write(doc.render.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def read(path: String): Option[JValue] = {
    val p = new HPath(path)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(JValue.parse(new String(in.readAllBytes(), StandardCharsets.UTF_8)))
      finally in.close()
    }
  }

  def catalogPath: String = s"$rootPath/catalog.json"
  def collectionPath(name: String): String = s"$rootPath/$name/collection.json"
  def itemPath(coll: String, id: String): String = s"$rootPath/$coll/$id.json"

  // ----------------------------------------------------------- link graph

  /** The root↔collection↔item link graph the reference maintains
    * (metadata.py:332-470 create_stac_collection links, 472-666 item
    * links): every document carries self/root, children point down
    * (child/item), non-roots point up (parent/collection). */
  private def link(rel: String, href: String): JObj =
    JObj(Seq("rel" -> JStr(rel), "href" -> JStr(href),
      "type" -> JStr("application/json")))

  /** Append a link unless an identical (rel, href) is already present —
    * re-publishes must not grow duplicate edges. */
  private def withLink(doc: JObj, rel: String, href: String): JObj = {
    val links = doc.get("links").collect { case JArr(ls) => ls }.getOrElse(Seq.empty)
    val dup = links.exists {
      case o: JObj =>
        o.get("rel").contains(JStr(rel)) && o.get("href").contains(JStr(href))
      case _ => false
    }
    if (dup) doc else doc.updated("links", JArr(links :+ link(rel, href)))
  }

  private def withLinks(doc: JObj, ls: Seq[(String, String)]): JObj =
    ls.foldLeft(doc) { case (d, (rel, href)) => withLink(d, rel, href) }

  /** Links of a document as (rel, href) pairs — catalog consumers walk
    * these. */
  def links(doc: JValue): Seq[(String, String)] = doc match {
    case o: JObj => o.get("links").collect { case JArr(ls) => ls }
      .getOrElse(Seq.empty).collect {
        case l: JObj =>
          (l.get("rel").collect { case JStr(r) => r }.getOrElse(""),
            l.get("href").collect { case JStr(h) => h }.getOrElse(""))
      }
    case _ => Seq.empty
  }

  /** Root catalog, created once (metadata.py:271-330). */
  def ensureRootCatalog(id: String, description: String): JObj =
    read(catalogPath).collect { case o: JObj => o }.getOrElse {
      val cat = withLinks(JObj(Seq(
        "type" -> JStr("Catalog"),
        "stac_version" -> JStr("1.0.0"),
        "id" -> JStr(id),
        "description" -> JStr(description),
        "links" -> JArr(Seq.empty))),
        Seq("self" -> catalogPath, "root" -> catalogPath))
      write(catalogPath, cat)
      cat
    }

  /** Create or union-update a collection: bbox extends by elementwise
    * min/max, temporal interval widens (metadata.py:332-470). */
  def upsertCollection(
      name: String,
      bbox: Seq[Double],
      intervalStart: String,
      intervalEnd: String,
      license: String = "proprietary"): JObj = {
    val existing = read(collectionPath(name)).collect { case o: JObj => o }
    val (newBbox, newStart, newEnd) = existing match {
      case Some(old) =>
        val oldBbox = old.get("extent").collect { case e: JObj => e }
          .flatMap(_.get("spatial")).collect { case s: JObj => s }
          .flatMap(_.get("bbox")).collect { case JArr(Seq(JArr(bs))) =>
            bs.collect { case JNum(n) => n } }
          .getOrElse(bbox)
        val merged =
          if (oldBbox.length == 4 && bbox.length == 4)
            Seq(math.min(oldBbox(0), bbox(0)), math.min(oldBbox(1), bbox(1)),
              math.max(oldBbox(2), bbox(2)), math.max(oldBbox(3), bbox(3)))
          else bbox
        val oldInterval = old.get("extent").collect { case e: JObj => e }
          .flatMap(_.get("temporal")).collect { case t: JObj => t }
          .flatMap(_.get("interval")).collect { case JArr(Seq(JArr(Seq(JStr(a), JStr(b))))) =>
            (a, b) }
        val s = oldInterval.map(_._1).filter(_ <= intervalStart).getOrElse(intervalStart)
        val e = oldInterval.map(_._2).filter(_ >= intervalEnd).getOrElse(intervalEnd)
        (merged, s, e)
      case None => (bbox, intervalStart, intervalEnd)
    }
    // carry forward previously-linked items — a bbox/interval update must
    // not orphan the collection's item edges (metadata.py:332-470)
    val priorLinks = existing.map(o => JArr(
      o.get("links").collect { case JArr(ls) => ls }.getOrElse(Seq.empty)))
      .getOrElse(JArr(Seq.empty))
    val coll = withLinks(JObj(Seq(
      "type" -> JStr("Collection"),
      "stac_version" -> JStr("1.0.0"),
      "id" -> JStr(name),
      "description" -> JStr(s"graft collection $name"),
      "license" -> JStr(license),
      "extent" -> JObj(Seq(
        "spatial" -> JObj(Seq("bbox" -> JArr(Seq(JArr(newBbox.map(JNum(_))))))),
        "temporal" -> JObj(Seq("interval" -> JArr(Seq(JArr(Seq(
          JStr(newStart), JStr(newEnd))))))))),
      "links" -> priorLinks)),
      Seq("self" -> collectionPath(name), "root" -> catalogPath,
        "parent" -> catalogPath))
    write(collectionPath(name), coll)
    // and the downward edge: catalog → child collection
    read(catalogPath).collect { case o: JObj => o }.foreach { cat =>
      val linked = withLink(cat, "child", collectionPath(name))
      if (linked ne cat) write(catalogPath, linked)
    }
    coll
  }

  /** Build + push an item from store attrs; geometry is the bbox polygon,
    * properties carry attrs + dim sizes (metadata.py:472-666). An existing
    * item is first copied to `history/<id>-<mtime>.json`
    * (store.py:440-500). */
  def pushItem(
      coll: String,
      id: String,
      bbox: Seq[Double],
      startDatetime: String,
      endDatetime: String,
      desc: DatasetDescriptor,
      dimSizes: Map[String, Long],
      extraProperties: Map[String, String] = Map.empty): JObj = {
    val path = itemPath(coll, id)
    val p = new HPath(path)
    if (fs.exists(p)) {
      val mtime = fs.getFileStatus(p).getModificationTime
      val hist = new HPath(s"$rootPath/$coll/history/$id-$mtime.json")
      fs.mkdirs(hist.getParent)
      org.apache.hadoop.fs.FileUtil.copy(fs, p, fs, hist, false,
        spark.sparkContext.hadoopConfiguration)
    }
    val Seq(minLon, minLat, maxLon, maxLat) =
      if (bbox.length == 4) bbox else Seq(0.0, 0.0, 0.0, 0.0)
    val geometry = JObj(Seq(
      "type" -> JStr("Polygon"),
      "coordinates" -> JArr(Seq(JArr(Seq(
        JArr(Seq(JNum(minLon), JNum(minLat))),
        JArr(Seq(JNum(maxLon), JNum(minLat))),
        JArr(Seq(JNum(maxLon), JNum(maxLat))),
        JArr(Seq(JNum(minLon), JNum(maxLat))),
        JArr(Seq(JNum(minLon), JNum(minLat)))))))))
    val props =
      Seq("start_datetime" -> JStr(startDatetime), "end_datetime" -> JStr(endDatetime),
        "dataset_name" -> JStr(desc.datasetName), "data_var" -> JStr(desc.dataVar),
        "time_resolution" -> JStr(desc.timeResolution.toString)) ++
      dimSizes.toSeq.sortBy(_._1).map { case (d, n) => s"dim_size:$d" -> JNum(n.toDouble) } ++
      extraProperties.toSeq.sortBy(_._1).map { case (k, v) => k -> JStr(v) }
    val item = withLinks(JObj(Seq(
      "type" -> JStr("Feature"),
      "stac_version" -> JStr("1.0.0"),
      "id" -> JStr(id),
      "bbox" -> JArr(bbox.map(JNum(_))),
      "geometry" -> geometry,
      "collection" -> JStr(coll),
      "properties" -> JObj(props),
      "links" -> JArr(Seq.empty),
      "assets" -> JObj(Seq.empty))),
      Seq("self" -> path, "root" -> catalogPath,
        "parent" -> collectionPath(coll), "collection" -> collectionPath(coll)))
    write(path, item)
    // downward edge: collection → item
    read(collectionPath(coll)).collect { case o: JObj => o }.foreach { c =>
      val linked = withLink(c, "item", path)
      if (linked ne c) write(collectionPath(coll), linked)
    }
    item
  }

  def readItem(coll: String, id: String): Option[JValue] = read(itemPath(coll, id))
  def readCollection(name: String): Option[JValue] = read(collectionPath(name))
  def historyCount(coll: String, id: String): Int = {
    val dir = new HPath(s"$rootPath/$coll/history")
    if (!fs.exists(dir)) 0
    else fs.listStatus(dir).count(_.getPath.getName.startsWith(s"$id-"))
  }
}

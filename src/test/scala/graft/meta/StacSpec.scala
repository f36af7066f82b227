package graft.meta

import java.nio.file.Files

import graft.SparkSpec
import graft.model.DatasetDescriptor

class StacSpec extends SparkSpec {

  private val desc = DatasetDescriptor("chirps_test", "precip")

  private def newCat(): StacCatalog =
    new StacCatalog(spark, Files.createTempDirectory("stac_spec").toString + "/stac")

  test("JSON AST round-trips nested documents") {
    val doc = JObj(Seq(
      "s" -> JStr("a\"b\nc"), "n" -> JNum(1.5), "i" -> JNum(42),
      "b" -> JBool(true), "z" -> JNull,
      "arr" -> JArr(Seq(JNum(1), JStr("x"))),
      "obj" -> JObj(Seq("k" -> JStr("v")))))
    assert(JValue.parse(doc.render) == doc)
  }

  test("root catalog created once, then reused (metadata.py:271-330)") {
    val cat = newCat()
    val c1 = cat.ensureRootCatalog("root", "first")
    val c2 = cat.ensureRootCatalog("root", "second description ignored")
    assert(c1 == c2)
    assert(c2.get("description") == Some(JStr("first")))
  }

  test("collection bbox unions and interval widens on update (metadata.py:332-470)") {
    val cat = newCat()
    cat.upsertCollection("coll", Seq(-10.0, -5.0, 10.0, 5.0),
      "2024-01-01T00:00:00Z", "2024-02-01T00:00:00Z")
    val updated = cat.upsertCollection("coll", Seq(-20.0, 0.0, 5.0, 8.0),
      "2024-01-15T00:00:00Z", "2024-03-01T00:00:00Z")
    val bbox = updated.get("extent").collect { case e: JObj => e }
      .flatMap(_.get("spatial")).collect { case s: JObj => s }
      .flatMap(_.get("bbox")).collect { case JArr(Seq(JArr(bs))) =>
        bs.collect { case JNum(n) => n } }.get
    assert(bbox == Seq(-20.0, -5.0, 10.0, 8.0))
    val interval = updated.get("extent").collect { case e: JObj => e }
      .flatMap(_.get("temporal")).collect { case t: JObj => t }
      .flatMap(_.get("interval")).get
    assert(interval == JArr(Seq(JArr(Seq(
      JStr("2024-01-01T00:00:00Z"), JStr("2024-03-01T00:00:00Z"))))))
  }

  test("item push preserves history and rebuilds geometry (store.py:440-500)") {
    val cat = newCat()
    cat.pushItem("coll", "item1", Seq(0.0, 0.0, 1.0, 1.0),
      "2024-01-01T00:00:00Z", "2024-01-31T00:00:00Z", desc,
      Map("time" -> 31L, "latitude" -> 4L))
    assert(cat.historyCount("coll", "item1") == 0)
    Thread.sleep(5) // distinct mtime for the history copy name
    cat.pushItem("coll", "item1", Seq(0.0, 0.0, 2.0, 2.0),
      "2024-01-01T00:00:00Z", "2024-02-29T00:00:00Z", desc, Map("time" -> 60L))
    assert(cat.historyCount("coll", "item1") == 1)
    val item = cat.readItem("coll", "item1").collect { case o: JObj => o }.get
    assert(item.get("bbox") == Some(JArr(Seq(JNum(0), JNum(0), JNum(2), JNum(2)))))
    val props = item.get("properties").collect { case p: JObj => p }.get
    assert(props.get("dim_size:time") == Some(JNum(60)))
    assert(props.get("end_datetime") == Some(JStr("2024-02-29T00:00:00Z")))
  }

  test("link graph is walkable root→collection→item and back (metadata.py:332-666)") {
    val cat = newCat()
    cat.ensureRootCatalog("root", "d")
    cat.upsertCollection("collA", Seq(0.0, 0.0, 1.0, 1.0),
      "2024-01-01T00:00:00Z", "2024-02-01T00:00:00Z")
    cat.pushItem("collA", "item1", Seq(0.0, 0.0, 1.0, 1.0),
      "2024-01-01T00:00:00Z", "2024-01-31T00:00:00Z", desc, Map("time" -> 31L))
    cat.pushItem("collA", "item2", Seq(0.0, 0.0, 1.0, 1.0),
      "2024-02-01T00:00:00Z", "2024-02-29T00:00:00Z", desc, Map("time" -> 29L))

    // walk DOWN: catalog → child href → collection → item hrefs → items
    val root = JValue.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(cat.catalogPath))))
    val childHrefs = cat.links(root).collect { case ("child", h) => h }
    assert(childHrefs == Seq(cat.collectionPath("collA")))
    val coll = cat.readCollection("collA").get
    val itemHrefs = cat.links(coll).collect { case ("item", h) => h }
    assert(itemHrefs.toSet ==
      Set(cat.itemPath("collA", "item1"), cat.itemPath("collA", "item2")))
    // walk UP: item → parent/collection/root
    val item = cat.readItem("collA", "item1").get
    val up = cat.links(item).toMap
    assert(up("parent") == cat.collectionPath("collA"))
    assert(up("collection") == cat.collectionPath("collA"))
    assert(up("root") == cat.catalogPath)
    assert(up("self") == cat.itemPath("collA", "item1"))
    // collection points up too
    val collUp = cat.links(coll).toMap
    assert(collUp("parent") == cat.catalogPath && collUp("root") == cat.catalogPath)

    // idempotence: re-push and re-upsert grow NO duplicate edges, and the
    // collection's item links survive the extent update
    cat.pushItem("collA", "item1", Seq(0.0, 0.0, 1.0, 1.0),
      "2024-01-01T00:00:00Z", "2024-01-31T00:00:00Z", desc, Map("time" -> 31L))
    cat.upsertCollection("collA", Seq(-1.0, 0.0, 1.0, 1.0),
      "2024-01-01T00:00:00Z", "2024-03-01T00:00:00Z")
    val coll2 = cat.readCollection("collA").get
    assert(cat.links(coll2).collect { case ("item", h) => h }.toSet == itemHrefs.toSet)
    assert(cat.links(coll2).size == cat.links(coll).size)
    val root2 = JValue.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(cat.catalogPath))))
    assert(cat.links(root2).collect { case ("child", h) => h }.size == 1)
  }
}

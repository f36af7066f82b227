package graft.functions

import graft.SparkSpec
import TfExample.Feature

/** tf.Example protobuf decode: writer-beside-reader roundtrips, packed
  * AND unpacked repeated scalars, negative int64 varints, unknown-field
  * skipping (forward compatibility), oneof violations refused. */
class TfExampleSpec extends SparkSpec {

  private val sample: Seq[(String, Feature)] = Seq(
    "text" -> Feature("bytes", bytesVals = Seq(
      "hello".getBytes("UTF-8"), "world".getBytes("UTF-8"))),
    "label" -> Feature("int64", int64Vals = Seq(3L, -7L, 1L << 40)),
    "score" -> Feature("float", floatVals = Seq(0.5f, -2.25f, 300f)))

  test("canonical (packed) roundtrip preserves keys, kinds, values, order") {
    val out = TfExample.parse(1L, TfExample.encode(sample))
    assert(out.map(_._1) == Seq("text", "label", "score"))
    assert(out.map(_._2.kind) == Seq("bytes", "int64", "float"))
    assert(out(0)._2.bytesVals.map(new String(_, "UTF-8")) ==
      Seq("hello", "world"))
    assert(out(1)._2.int64Vals == Seq(3L, -7L, 1L << 40))
    assert(out(2)._2.floatVals == Seq(0.5f, -2.25f, 300f))
  }

  test("UNPACKED repeated scalars parse (hand-encoded wire bytes)") {
    // Feature{int64_list{value: 5, value: 600}} with unpacked varints:
    // Int64List = (field1,wire0) 5, (field1,wire0) varint(600)
    def vint(v: Long): Array[Byte] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var x = v; var more = true
      while (more) {
        val b = (x & 0x7F).toInt; x = x >>> 7; more = x != 0
        out += (if (more) b | 0x80 else b).toByte
      }
      out.toArray
    }
    def len(num: Int, p: Array[Byte]): Array[Byte] =
      vint((num << 3) | 2) ++ vint(p.length.toLong) ++ p
    val int64List = vint(1 << 3) ++ vint(5) ++ vint(1 << 3) ++ vint(600)
    val feature = len(3, int64List)
    val entry = len(1, len(1, "n".getBytes) ++ len(2, feature))
    // unpacked floats: (field1, wire5) f32
    val fBits = java.lang.Float.floatToIntBits(1.5f)
    val floatList = vint((1 << 3) | 5) ++
      Array.tabulate(4)(i => ((fBits >> (8 * i)) & 0xFF).toByte)
    val entry2 = len(1, len(1, "f".getBytes) ++ len(2, len(2, floatList)))
    val example = len(1, entry ++ entry2)
    val out = TfExample.parse(2L, example)
    assert(out == Seq(
      "n" -> Feature("int64", int64Vals = Seq(5L, 600L)),
      "f" -> Feature("float", floatVals = Seq(1.5f))))
  }

  test("unknown field numbers skip per proto semantics; unknown wire " +
      "types and oneof violations refuse by name") {
    val base = TfExample.encode(Seq("k" -> Feature("int64", int64Vals = Seq(1L))))
    // append an unknown top-level field 9 (varint) — must be ignored
    val extra = base ++ Array[Byte]((9 << 3).toByte, 42)
    assert(TfExample.parse(3L, extra).map(_._1) == Seq("k"))
    // wire type 3 (deprecated group) refuses
    val bad = base ++ Array[Byte](((9 << 3) | 3).toByte)
    val e = intercept[IllegalArgumentException](TfExample.parse(4L, bad))
    assert(e.getMessage.contains("wire type"), e.getMessage)
    // a Feature with two list kinds refuses
    val twoKinds = {
      def vint(v: Long) = Array((v & 0x7F).toByte) // small values only
      def len(num: Int, p: Array[Byte]) =
        vint((num << 3) | 2) ++ vint(p.length.toLong) ++ p
      val f = len(3, len(1, vint(1))) ++ len(2, len(1, Array.emptyByteArray))
      len(1, len(1, len(1, "x".getBytes) ++ len(2, f)))
    }
    val e2 = intercept[IllegalArgumentException](TfExample.parse(5L, twoKinds))
    assert(e2.getMessage.contains("oneof"), e2.getMessage)
  }

  test("repeated occurrences of the same list field (and of the Feature " +
      "value field) MERGE per protobuf embedded-message semantics") {
    def vint(v: Long): Array[Byte] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var x = v; var more = true
      while (more) {
        val b = (x & 0x7F).toInt; x = x >>> 7; more = x != 0
        out += (if (more) b | 0x80 else b).toByte
      }
      out.toArray
    }
    def len(num: Int, p: Array[Byte]): Array[Byte] =
      vint((num << 3) | 2) ++ vint(p.length.toLong) ++ p
    // one Feature whose Int64List field (3) occurs TWICE — a hand-written
    // encoder emitting split lists; earlier values must survive
    val splitLists = len(3, len(1, vint(1) ++ vint(2))) ++
      len(3, len(1, vint(3)))
    val entry = len(1, len(1, "a".getBytes) ++ len(2, splitLists))
    val out = TfExample.parse(6L, len(1, entry))
    assert(out == Seq("a" -> Feature("int64", int64Vals = Seq(1L, 2L, 3L))))
    // the map-entry VALUE field (2) occurring twice also merges
    val entry2 = len(1, len(1, "b".getBytes) ++
      len(2, len(3, len(1, vint(7)))) ++ len(2, len(3, len(1, vint(8)))))
    val out2 = TfExample.parse(7L, len(1, entry2))
    assert(out2 == Seq("b" -> Feature("int64", int64Vals = Seq(7L, 8L))))
    // merged occurrences with DIFFERENT kinds still violate the oneof
    val entry3 = len(1, len(1, "c".getBytes) ++
      len(2, len(3, len(1, vint(7)))) ++
      len(2, len(1, len(1, Array.emptyByteArray))))
    val e = intercept[IllegalArgumentException](
      TfExample.parse(8L, len(1, entry3)))
    assert(e.getMessage.contains("oneof"), e.getMessage)
  }

  test("featureTable: TFRecord shard → one row per (record, key)") {
    val sp = spark; import sp.implicits._
    val shard = TfRecord.encode(Seq(
      TfExample.encode(Seq(
        "text" -> Feature("bytes", bytesVals = Seq("doc one".getBytes)),
        "label" -> Feature("int64", int64Vals = Seq(2L)))),
      TfExample.encode(Seq(
        "text" -> Feature("bytes", bytesVals = Seq("doc two".getBytes))))))
    val df = Seq((7L, shard)).toDF("id", "tfr")
    val rows = TfExample.featureTable(df, "id", "tfr")
      .orderBy("rec_idx", "key").collect()
    assert(rows.length == 3)
    assert(rows.map(r => (r.getAs[Int]("rec_idx"), r.getAs[String]("key"))).toSeq ==
      Seq((0, "label"), (0, "text"), (1, "text")))
    assert(rows(1).getAs[scala.collection.Seq[String]]("text_vals").toSeq ==
      Seq("doc one"))
    assert(rows(0).getAs[scala.collection.Seq[Long]]("int64_vals").toSeq ==
      Seq(2L))
  }

  test("writeExampleShards: byte-deterministic across input " +
      "partitionings; duplicate keys refuse by name; TF-framing " +
      "re-ingest roundtrips") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions._
    val sp = spark
    import sp.implicits._
    val rows = (0 until 40).map(i => (s"k$i", s"text $i", i.toLong))
    def write(parts: Int): (String, Map[String, Array[Byte]]) = {
      val dir = Files.createTempDirectory("tfxw").toString
      TfExample.writeExampleShards(
        rows.toDF("uri", "text", "n").repartition(parts),
        "uri", Seq("uri", "text"), Seq("n"), dir, nShards = 4)
      val bytes = new java.io.File(dir).listFiles().filter(_.isFile)
        .map(f => f.getName -> Files.readAllBytes(Paths.get(f.toString)))
        .toMap
      (dir, bytes)
    }
    val (d1, b1) = write(1)
    val (_, b7) = write(7)
    assert(b1.keySet == b7.keySet && b1.keySet.forall(k =>
      java.util.Arrays.equals(b1(k), b7(k))))
    // re-ingest through the framing + proto readers
    val back = TfExample.featureTable(
      spark.read.format("binaryFile").load(d1)
        .select(lit(0L).as("id"), col("content").as("tfr")), "id", "tfr")
      .filter(col("key") === "n")
      .select(explode(col("int64_vals")).as("n")).as[Long].collect().sorted
    assert(back.toSeq == (0L until 40L))
    // duplicate keys refuse by name
    val dup = (rows :+ ("k0", "again", 99L)).toDF("uri", "text", "n")
    val dir2 = Files.createTempDirectory("tfxdup").toString
    val e = intercept[org.apache.spark.SparkException](
      TfExample.writeExampleShards(dup, "uri", Seq("uri", "text"),
        Seq("n"), dir2, nShards = 4))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("duplicate")), e.getMessage)
  }

  test("writeExampleShards: null feature cells and null keys refuse by " +
      "NAME (never a bare NPE from proto encoding)") {
    import java.nio.file.Files
    val sp = spark
    import sp.implicits._
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val nullText = Seq(("k0", "ok", 1L), ("k1", null.asInstanceOf[String], 2L))
      .toDF("uri", "text", "n")
    val e1 = intercept[org.apache.spark.SparkException](
      TfExample.writeExampleShards(nullText, "uri", Seq("uri", "text"),
        Seq("n"), Files.createTempDirectory("tfxn1").toString, nShards = 2))
    assert(msgs(e1).exists(m => m.contains("null value") &&
      m.contains("'text'") && m.contains("k1")), e1.getMessage)
    val nullKey = Seq(("k0", "ok", 1L),
      (null.asInstanceOf[String], "x", 2L)).toDF("uri", "text", "n")
    val e2 = intercept[org.apache.spark.SparkException](
      TfExample.writeExampleShards(nullKey, "uri", Seq("uri", "text"),
        Seq("n"), Files.createTempDirectory("tfxn2").toString, nShards = 2))
    assert(msgs(e2).exists(m => m.contains("null key") &&
      m.contains("'uri'")), e2.getMessage)
  }
}

package graft.sources.grib

import java.time.LocalDateTime

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Generative differential test of the FULL GRIB2 hypercube key —
  * (discipline-qualified param, member | derived, level_type, level,
  * level_to, interval) in combination. The single-axis specs each pin one
  * octet layout; this one catches offset regressions that only surface
  * when axes coexist (e.g. template 4.11's interval-end rides AFTER the
  * ensemble octets, 4.12's after the derived octets — a wrong base index
  * decodes fine alone and garbles the combination). */
class GribHypercubeFuzzSpec extends SparkSpec {

  private val lats = Seq(0.0, 1.0)
  private val lons = Seq(10.0, 11.0)

  private def write(path: String)(body: java.io.DataOutputStream => Unit): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(p, true)))
    try body(out) finally out.close()
  }

  test("random axis combinations round-trip the full hypercube key " +
      "bit-exactly (16 seeds)") {
    for (seed <- 0 until 16) {
      val rnd = new Random(seed * 7919 + 3)
      val ref = LocalDateTime.of(2024, 1 + rnd.nextInt(12), 1 + rnd.nextInt(28),
        rnd.nextInt(24), 0)
      val discipline = if (rnd.nextBoolean()) 0 else 2
      val levels: Seq[(Int, Long)] =
        if (rnd.nextBoolean()) Seq((100, 85000L), (100, 50000L))
        else Seq((1, 0L))
      val layerTop: Option[Long] =
        if (levels.head._1 == 1 && rnd.nextBoolean()) Some(10L) else None
      // member XOR derived XOR deterministic
      val (members, deriveds) = rnd.nextInt(3) match {
        case 0 => (Seq(0, 1), Seq(-1, -1))
        case 1 => (Seq(-1, -1), Seq(0, 2))
        case _ => (Seq(-1), Seq(-1))
      }
      val interval = if (rnd.nextBoolean()) 2 else 0
      val lead = rnd.nextInt(12)

      // hypercube index space: level x (member|derived slot)
      final case class Cube(level: (Int, Long), slot: Int, base: Double)
      val cubes = for {
        (lv, li) <- levels.zipWithIndex
        s <- members.indices
      } yield Cube(lv, s, (li * members.length + s) * 100.0 + seed)

      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_cubefuzz_$seed"
      write(s"$dir/f.grb2") { out =>
        GribFormat.writeMessage2Fields(out, ref, lats, lons,
          fields = cubes.map(c =>
            (61, lead, Array.tabulate(4)(c.base + _.toDouble))),
          levels = cubes.map(_.level),
          levelTops = layerTop.map(t => cubes.map(_ => t)).getOrElse(Seq.empty),
          members = cubes.map(c => members(c.slot)),
          derivedStats = cubes.map(c => deriveds(c.slot)),
          intervals =
            if (interval > 0) cubes.map(_ => interval) else Seq.empty,
          discipline = discipline)
      }

      val df = spark.read.format("grib1").load(s"$dir/f.grb2")
      assert(df.count() == cubes.length * 4, s"seed=$seed row count")
      // the key columns identify every hypercube exactly once
      assert(df.select("param", "member", "derived", "level_type", "level",
        "level_to", "time", "ref_time", "step").distinct().count() ==
        cubes.length, s"seed=$seed distinct keys")
      val expValid =
        if (interval > 0) ref.plusHours(lead.toLong + interval)
        else ref.plusHours(lead.toLong)
      cubes.foreach { c =>
        var q = df.filter(col("param") === ((discipline << 16) | 61) &&
          col("level_type") === c.level._1 && col("level") === c.level._2)
        q = layerTop match {
          case Some(t) => q.filter(col("level_to") === t.toDouble)
          case None => q.filter(col("level_to").isNull)
        }
        q = (members(c.slot), deriveds(c.slot)) match {
          case (m, _) if m >= 0 =>
            q.filter(col("member") === m && col("derived").isNull)
          case (_, d) if d >= 0 =>
            q.filter(col("derived") === d && col("member").isNull)
          case _ =>
            q.filter(col("member").isNull && col("derived").isNull)
        }
        val rows = q.orderBy("latitude", "longitude").collect()
        assert(rows.length == 4, s"seed=$seed cube=$c got ${rows.length}")
        rows.foreach { r =>
          assert(r.getAs[LocalDateTime]("time") == expValid,
            s"seed=$seed cube=$c valid time")
          assert(r.getAs[LocalDateTime]("ref_time") == ref,
            s"seed=$seed cube=$c ref time")
          assert(r.getAs[Long]("step") == (lead + interval) * 60L,
            s"seed=$seed cube=$c step")
        }
        // cells: lat-major, lon fastest — value = base + cell index
        val got = rows.map(_.getAs[Double]("value")).toSeq
        val lat0 = rows.map(_.getAs[Double]("latitude")).distinct.sorted.toSeq
        assert(lat0 == Seq(0.0, 1.0), s"seed=$seed cube=$c lats")
        assert(got == Seq(c.base, c.base + 1, c.base + 2, c.base + 3),
          s"seed=$seed cube=$c values $got")
      }
    }
  }
}

package graft.managers

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.{Registry, TimeSpan}

/** Example-manager wiring end-to-end, offline (injected fetcher). */
class ChirpsLikeManagerSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def grid(startDay: Int, nDays: Int) = {
    val rows = for {
      d <- 0 until nDays
      lat <- Seq(-10.0, 60.0) // 60.0 is outside CHIRPS coverage → scrubbed
      lon <- Seq(30.0, 31.0)
    } yield (ts(f"2024-01-${startDay + d}%02dT00:00:00"), lat, lon, d + lat + lon)
    rows.toDF("time", "latitude", "longitude", "precip")
  }

  test("extract (injected fetcher) lands files in the input dir") {
    val root = Files.createTempDirectory("chirps_fetch").toString
    val fetched = scala.collection.mutable.ArrayBuffer.empty[String]
    val mgr = new ChirpsLikeManager(spark, root,
      fetcher = (url, dest: Path) => {
        fetched += url
        Files.writeString(dest, "fake-bytes")
      })
    val out = mgr.extractUrls(Seq(
      "ftp://example.invalid/pub/chirps-1981.nc",
      "ftp://example.invalid/pub/chirps-1982.nc"))
    assert(fetched.size == 2 && out.size == 2)
    assert(out.forall(p => Files.exists(p) && p.startsWith(root)))
  }

  test("registered descriptor → transform → publish → reopen lifecycle") {
    val root = Files.createTempDirectory("chirps_like").toString
    val reg = new Registry[graft.model.DatasetDescriptor]
    val mgr = ChirpsLikeManager.registerIn(reg, spark, root)

    // O5: descriptor resolvable by name + resolution
    assert(reg.get("chirps_final_25", Some(TimeSpan.Daily)).isDefined)

    grid(1, 5).write.parquet(s"${mgr.inputDir}/jan.parquet")
    mgr.run()
    val ds = mgr.store.dataset()
    // postprocess scrubbed lat=60 rows: 5 days × 1 lat × 2 lon
    assert(ds.count() == 10)
    assert(ds.agg(max(col("latitude"))).head().getDouble(0) == -10.0)
    // value column typed by normalize (float32 enforcement)
    assert(ds.schema("precip").dataType.typeName == "float")
    assert(mgr.getMetadataDateRange().map(_._2.toString) == Some("2024-01-05T00:00"))
    // static metadata flowed into the attrs sidecar
    assert(mgr.store.readAttrs().get("collection_name") == Some("CHIRPS"))
  }

  test("extract guard rejects pre-start ranges (O2, chirps start 1981)") {
    val root = Files.createTempDirectory("chirps_like2").toString
    val mgr = new ChirpsLikeManager(spark, root)
    assertThrows[IllegalArgumentException] {
      mgr.extract(Some((ts("1979-01-01T00:00:00"), ts("1982-01-01T00:00:00"))))
    }
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CRS projection operators (SURVEY §2.4 C6; util_funcs/projections.py:6-43).
  *
  * The reference assigns projected y/x coordinates (renamed
  * northing/easting) from a CF grid-mapping via metpy/pyproj. Without a
  * projection library in this environment, the two projections the climate
  * corpus actually uses are implemented directly as codegen'd column math:
  * identity lat/lon (EPSG:4326) and spherical Mercator (EPSG:3857) — the
  * closed-form formulas are public knowledge. Further CRSs plug in as
  * additional cases.
  */
object Projection {

  private val EarthRadius = 6378137.0

  /** Forward-project (lat, lon) → (northing, easting) for the given EPSG. */
  def project(lat: Column, lon: Column, epsg: Int): (Column, Column) = epsg match {
    case 4326 => (lat, lon)
    case 3857 =>
      val x = lon * lit(math.Pi / 180.0) * lit(EarthRadius)
      val y = log(tan(lit(math.Pi / 4.0) + lat * lit(math.Pi / 360.0))) * lit(EarthRadius)
      (y, x)
    case other =>
      throw new IllegalArgumentException(s"Unsupported EPSG:$other (4326, 3857 available)")
  }

  /** C6 — add `northing`/`easting` columns from the spatial dims, mirroring
    * assign_crs_to_dataset's renamed y/x coords (projections.py:36-43,
    * conftest.py:260-266). The CRS identifier lands in the attrs sidecar,
    * not the data. */
  def assignCrs(df: DataFrame, latCol: String, lonCol: String, epsg: Int): DataFrame = {
    val (n, e) = project(col(latCol), col(lonCol), epsg)
    df.withColumn("northing", n).withColumn("easting", e)
  }

  /** Inverse of EPSG:3857 for round-trip checks. */
  def unproject3857(northing: Column, easting: Column): (Column, Column) = {
    val lon = easting / lit(EarthRadius) * lit(180.0 / math.Pi)
    val lat = (atan(exp(northing / lit(EarthRadius))) - lit(math.Pi / 4.0)) * lit(360.0 / math.Pi)
    (lat, lon)
  }

  /** W15 — GeoZarr-style CRS convention attrs (conventions.py:44-199):
    * `proj:code`, `proj:wkt2`, `proj:projjson` for the supported EPSG codes.
    * The WKT2/PROJJSON texts are the standard published definitions (EPSG
    * registry / OGC WKT2:2019); a projection library would emit the same
    * strings. Merged into the store's attrs sidecar / STAC item properties.
    */
  def crsAttrs(epsg: Int): Map[String, String] = epsg match {
    case 4326 => Map(
      "proj:code" -> "EPSG:4326",
      "proj:wkt2" ->
        ("""GEOGCRS["WGS 84",DATUM["World Geodetic System 1984",""" +
          """ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]],""" +
          """PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]],""" +
          """CS[ellipsoidal,2],AXIS["geodetic latitude (Lat)",north],""" +
          """AXIS["geodetic longitude (Lon)",east],""" +
          """ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",4326]]"""),
      "proj:projjson" ->
        ("""{"type":"GeographicCRS","name":"WGS 84","datum":{"type":"GeodeticReferenceFrame",""" +
          """"name":"World Geodetic System 1984","ellipsoid":{"name":"WGS 84",""" +
          """"semi_major_axis":6378137,"inverse_flattening":298.257223563}},""" +
          """"id":{"authority":"EPSG","code":4326}}"""))
    case 3857 => Map(
      "proj:code" -> "EPSG:3857",
      "proj:wkt2" ->
        ("""PROJCRS["WGS 84 / Pseudo-Mercator",BASEGEOGCRS["WGS 84",""" +
          """DATUM["World Geodetic System 1984",ELLIPSOID["WGS 84",6378137,""" +
          """298.257223563,LENGTHUNIT["metre",1]]],ID["EPSG",4326]],""" +
          """CONVERSION["Popular Visualisation Pseudo-Mercator",""" +
          """METHOD["Popular Visualisation Pseudo Mercator",ID["EPSG",1024]]],""" +
          """CS[Cartesian,2],AXIS["easting (X)",east],AXIS["northing (Y)",north],""" +
          """LENGTHUNIT["metre",1],ID["EPSG",3857]]"""),
      "proj:projjson" ->
        ("""{"type":"ProjectedCRS","name":"WGS 84 / Pseudo-Mercator",""" +
          """"base_crs":{"name":"WGS 84","id":{"authority":"EPSG","code":4326}},""" +
          """"conversion":{"name":"Popular Visualisation Pseudo-Mercator",""" +
          """"method":{"name":"Popular Visualisation Pseudo Mercator",""" +
          """"id":{"authority":"EPSG","code":1024}}},""" +
          """"id":{"authority":"EPSG","code":3857}}"""))
    case other =>
      throw new IllegalArgumentException(s"Unsupported EPSG:$other (4326, 3857 available)")
  }

  /** W15 — `spatial:` convention attrs for a regular grid: dimensions,
    * shape, bbox, registration (conventions.py:200-312). Computed from the
    * distinct coordinate sets in one tiny aggregation. */
  def spatialAttrs(df: DataFrame, latCol: String, lonCol: String): Map[String, String] = {
    val r = df.agg(
      countDistinct(col(latCol)).as("nlat"), countDistinct(col(lonCol)).as("nlon"),
      min(col(lonCol)).as("minlon"), min(col(latCol)).as("minlat"),
      max(col(lonCol)).as("maxlon"), max(col(latCol)).as("maxlat")).head()
    Map(
      "spatial:dimensions" -> s"$latCol,$lonCol",
      "spatial:shape" -> s"${r.getLong(0)},${r.getLong(1)}",
      "spatial:bbox" -> s"${r.get(2)},${r.get(3)},${r.get(4)},${r.get(5)}",
      "spatial:registration" -> "center")
  }

  /** W15 helper — regular-grid detection (conventions.py:200-260): the
    * distinct coordinate values must be evenly spaced within 1% of the
    * median spacing. One tiny aggregation over the distinct coord set. */
  def isRegularGrid(df: DataFrame, coordCol: String): Boolean = {
    import org.apache.spark.sql.expressions.Window
    val distinct = df.select(col(coordCol).cast("double")).distinct()
    val w = Window.orderBy(col(coordCol))
    val diffs = distinct
      .withColumn("__diff", col(coordCol) - lag(col(coordCol), 1).over(w))
      .filter(col("__diff").isNotNull)
    if (diffs.isEmpty) return true
    val stats = diffs.agg(
      expr("percentile_approx(__diff, 0.5)").as("med"),
      max(abs(col("__diff"))).as("mx"), min(abs(col("__diff"))).as("mn")).head()
    val med = stats.getDouble(0)
    med != 0.0 && math.abs(stats.getDouble(1) - med) <= 0.01 * math.abs(med) &&
      math.abs(stats.getDouble(2) - med) <= 0.01 * math.abs(med)
  }
}

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

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

  // ------------------------------------------------- CF grid mappings (C6)

  /** Parameterized CF grid mappings — the form real projected datasets
    * carry (HRRR's Lambert conformal, polar-stereographic sea-ice grids);
    * the reference resolves these via metpy/pyproj
    * (util_funcs/projections.py:6-43, conventions.py:44-199). The spherical
    * closed forms below are Snyder, "Map Projections — A Working Manual"
    * (USGS PP 1395), eqs. 15-1..15-11 and 21-1..21-15 — public formulas;
    * NWP grids (HRRR et al.) are defined on exactly this 6371229 m sphere. */
  sealed trait GridMapping {
    def radius: Double
    /** Scalar inverse (projected y, x) → (lat, lon) degrees — every
      * mapping implements it; the trait-level signature lets projected
      * GRID walks dispatch virtually instead of closing over the
      * concrete method per cell. */
    def inverseXY(y: Double, x: Double): (Double, Double)
  }

  /** `lambert_conformal_conic`: two standard parallels `lat1`/`lat2`
    * (degrees), origin (`lat0`, `lon0`). */
  final case class LambertConformalConic(
      lat0: Double, lon0: Double, lat1: Double, lat2: Double,
      radius: Double = 6371229.0) extends GridMapping {
    private val p1 = math.toRadians(lat1)
    private val p2 = math.toRadians(lat2)
    /** Cone constant. */
    val n: Double =
      if (lat1 == lat2) math.sin(p1)
      else math.log(math.cos(p1) / math.cos(p2)) /
        math.log(math.tan(math.Pi / 4 + p2 / 2) / math.tan(math.Pi / 4 + p1 / 2))
    val f: Double = math.cos(p1) * math.pow(math.tan(math.Pi / 4 + p1 / 2), n) / n
    val rho0: Double =
      radius * f / math.pow(math.tan(math.Pi / 4 + math.toRadians(lat0) / 2), n)

    /** Scalar forward (same formula as the Column path) — used by readers
      * that walk projected grids cell-by-cell (GRIB template 3.30). */
    def forwardXY(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val rho = radius * f /
        math.pow(math.tan(math.Pi / 4 + math.toRadians(latDeg) / 2), n)
      val theta = math.toRadians(lonDeg - lon0) * n
      (rho0 - rho * math.cos(theta), rho * math.sin(theta)) // (y, x)
    }

    /** Scalar inverse → (lat, lon) degrees. */
    def inverseXY(y: Double, x: Double): (Double, Double) = {
      val dy = rho0 - y
      val s = math.signum(n)
      val rho = math.sqrt(x * x + dy * dy) * s
      val theta = math.atan2(x * s, dy * s)
      val lat = math.toDegrees(
        2.0 * math.atan(math.pow(radius * f / rho, 1.0 / n)) - math.Pi / 2)
      (lat, lon0 + math.toDegrees(theta) / n)
    }
  }

  /** `rotated_latitude_longitude` (CF) — the regional-NWP family
    * (COSMO/ICON/HARMONIE; GRIB2 grid template 3.1). Not a metre
    * projection: "northing/easting" are the ROTATED latitude/longitude in
    * degrees. `poleLat`/`poleLon` are the geographic coordinates of the
    * rotated north pole (CF `grid_north_pole_latitude/longitude`);
    * `angle` is CF `north_pole_grid_longitude` (usually 0). Pure rotation
    * matrices (sphere-radius free): rotate the pole meridian to x-z, tilt
    * the pole onto the z-axis, and point rotated-longitude 0 AWAY from the
    * pole meridian — the COSMO convention, under which the true north pole
    * maps to (rlat = poleLat, rlon = 0) and COSMO-EU's (40, −170) pole
    * puts Europe's (50°N, 10°E) at the rotated origin. */
  final case class RotatedPole(
      poleLat: Double, poleLon: Double, angle: Double = 0.0,
      radius: Double = 6371229.0) extends GridMapping {
    private val sp = math.sin(math.toRadians(poleLat))
    private val cp = math.cos(math.toRadians(poleLat))

    /** (lat, lon) degrees → (rotated lat, rotated lon) degrees. */
    def forwardXY(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val a = math.toRadians(lonDeg - poleLon)
      val x = math.cos(phi) * math.cos(a)
      val y = math.cos(phi) * math.sin(a)
      val z = math.sin(phi)
      val x2 = z * cp - x * sp // rotated-lon 0 away from the pole meridian
      val y2 = -y
      val z2 = x * cp + z * sp
      (math.toDegrees(math.asin(math.max(-1.0, math.min(1.0, z2)))),
        normLon(math.toDegrees(math.atan2(y2, x2)) - angle))
    }

    /** (rotated lat, rotated lon) degrees → (lat, lon) degrees. */
    def inverseXY(rlatDeg: Double, rlonDeg: Double): (Double, Double) = {
      val phi = math.toRadians(rlatDeg)
      val a = math.toRadians(rlonDeg + angle)
      val x2 = math.cos(phi) * math.cos(a)
      val y2 = math.cos(phi) * math.sin(a)
      val z2 = math.sin(phi)
      val x = -x2 * sp + z2 * cp
      val z = x2 * cp + z2 * sp
      (math.toDegrees(math.asin(math.max(-1.0, math.min(1.0, z)))),
        normLon(math.toDegrees(math.atan2(-y2, x)) + poleLon))
    }

    private def normLon(l: Double): Double =
      if (l <= -180.0) l + 360.0 else if (l > 180.0) l - 360.0 else l
  }

  /** `polar_stereographic`: `northPole` aspect flag, straight vertical
    * longitude `lon0`, true-scale (standard) parallel `latTs`. */
  final case class PolarStereographic(
      northPole: Boolean, lon0: Double, latTs: Double,
      radius: Double = 6371229.0) extends GridMapping {
    /** Scale factor at the pole giving true scale at `latTs` (Snyder 21-7). */
    val k0: Double =
      (1.0 + (if (northPole) math.sin(math.toRadians(latTs))
              else -math.sin(math.toRadians(latTs)))) / 2.0

    /** Scalar forward (same Snyder 21-5..21-10 formulas as the Column
      * path) — used by readers that walk projected grids cell-by-cell
      * (GRIB template 3.20). */
    def forwardXY(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val s = if (northPole) 1.0 else -1.0
      val phi = math.toRadians(latDeg) * s
      val rho = 2.0 * radius * k0 * math.tan(math.Pi / 4 - phi / 2)
      val dl = math.toRadians(lonDeg - lon0)
      (-rho * math.cos(dl) * s, rho * math.sin(dl)) // (y, x)
    }

    /** Scalar inverse → (lat, lon) degrees. */
    def inverseXY(y: Double, x: Double): (Double, Double) = {
      val s = if (northPole) 1.0 else -1.0
      val yn = -y * s // = ρ·cos(λ−λ0) in either aspect
      val rho = math.sqrt(x * x + yn * yn)
      val phi = math.Pi / 2 - 2.0 * math.atan(rho / (2.0 * radius * k0))
      (math.toDegrees(phi) * s, lon0 + math.toDegrees(math.atan2(x, yn)))
    }
  }

  /** `mercator` (CF): spherical Mercator with true scale at the standard
    * parallel `latTs` (Snyder 7-1/7-2 scaled by cos latTs) — GRIB2 grid
    * template 3.10's mapping; latTs = 0 gives the classic form
    * underlying EPSG:3857's spherical case. */
  final case class Mercator(
      lon0: Double, latTs: Double = 0.0,
      radius: Double = 6371229.0) extends GridMapping {
    /** Metres per radian at the standard parallel. */
    val scale: Double = radius * math.cos(math.toRadians(latTs))

    /** Scalar forward — used by readers that walk projected grids
      * cell-by-cell (GRIB template 3.10). */
    def forwardXY(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val y = scale *
        math.log(math.tan(math.Pi / 4 + math.toRadians(latDeg) / 2))
      (y, scale * math.toRadians(lonDeg - lon0)) // (y, x)
    }

    /** Scalar inverse → (lat, lon) degrees. */
    def inverseXY(y: Double, x: Double): (Double, Double) = {
      val lat = math.toDegrees(
        2.0 * math.atan(math.exp(y / scale)) - math.Pi / 2)
      (lat, lon0 + math.toDegrees(x / scale))
    }
  }

  private val D2R = math.Pi / 180.0

  /** Forward (lat, lon in degrees) → (northing, easting in metres). */
  def project(lat: Column, lon: Column, gm: GridMapping): (Column, Column) = gm match {
    case m: LambertConformalConic =>
      val rho = lit(m.radius * m.f) /
        pow(tan(lit(math.Pi / 4) + lat * lit(D2R / 2)), lit(m.n))
      val theta = (lon - lit(m.lon0)) * lit(D2R * m.n)
      val x = rho * sin(theta)
      val y = lit(m.rho0) - rho * cos(theta)
      (y, x)
    case m: PolarStereographic =>
      // Snyder 21-5..21-10: north aspect y = −ρcos(λ−λ0); south aspect
      // (mirror through the equator) y = +ρcos(λ−λ0), with pole-relative
      // latitude s·φ in ρ.
      val s = if (m.northPole) 1.0 else -1.0
      val phi = lat * lit(D2R * s)
      val rho = lit(2.0 * m.radius * m.k0) * tan(lit(math.Pi / 4) - phi / 2)
      val dl = (lon - lit(m.lon0)) * lit(D2R)
      val x = rho * sin(dl)
      val y = negate(rho * cos(dl)) * lit(s)
      (y, x)
    case m: Mercator =>
      val y = lit(m.scale) * log(tan(lit(math.Pi / 4) + lat * lit(D2R / 2)))
      val x = (lon - lit(m.lon0)) * lit(D2R * m.scale)
      (y, x)
    case m: RotatedPole =>
      val sp = lit(math.sin(math.toRadians(m.poleLat)))
      val cp = lit(math.cos(math.toRadians(m.poleLat)))
      val phi = lat * lit(D2R)
      val a = (lon - lit(m.poleLon)) * lit(D2R)
      val x = cos(phi) * cos(a)
      val y = cos(phi) * sin(a)
      val z = sin(phi)
      val rlat = asin(x * cp + z * sp) * lit(1.0 / D2R)
      val rlon = normLonCol(
        atan2(negate(y), z * cp - x * sp) * lit(1.0 / D2R) - lit(m.angle))
      (rlat, rlon)
  }

  private def normLonCol(l: Column): Column =
    when(l <= lit(-180.0), l + lit(360.0))
      .when(l > lit(180.0), l - lit(360.0))
      .otherwise(l)

  /** Inverse (northing, easting in metres) → (lat, lon in degrees). */
  def unproject(northing: Column, easting: Column, gm: GridMapping): (Column, Column) =
    gm match {
      case m: LambertConformalConic =>
        val dy = lit(m.rho0) - northing
        val rho = sqrt(easting * easting + dy * dy) * lit(math.signum(m.n))
        val theta = atan2(easting * lit(math.signum(m.n)), dy * lit(math.signum(m.n)))
        val lat = (atan(pow(lit(m.radius * m.f) / rho, lit(1.0 / m.n))) * lit(2.0)
          - lit(math.Pi / 2)) * lit(1.0 / D2R)
        val lon = lit(m.lon0) + theta * lit(1.0 / (D2R * m.n))
        (lat, lon)
      case m: PolarStereographic =>
        val s = if (m.northPole) 1.0 else -1.0
        val yn = negate(northing) * lit(s) // = ρ·cos(λ−λ0) in either aspect
        val rho = sqrt(easting * easting + yn * yn)
        val phi = lit(math.Pi / 2) - atan(rho / lit(2.0 * m.radius * m.k0)) * lit(2.0)
        val lat = phi * lit(s / D2R)
        val lon = lit(m.lon0) + atan2(easting, yn) * lit(1.0 / D2R)
        (lat, lon)
      case m: Mercator =>
        val lat = (atan(exp(northing / lit(m.scale))) * lit(2.0)
          - lit(math.Pi / 2)) * lit(1.0 / D2R)
        val lon = lit(m.lon0) + easting * lit(1.0 / (D2R * m.scale))
        (lat, lon)
      case m: RotatedPole =>
        val sp = lit(math.sin(math.toRadians(m.poleLat)))
        val cp = lit(math.cos(math.toRadians(m.poleLat)))
        val phi = northing * lit(D2R)
        val a = (easting + lit(m.angle)) * lit(D2R)
        val x2 = cos(phi) * cos(a)
        val y2 = cos(phi) * sin(a)
        val z2 = sin(phi)
        val lat = asin(x2 * cp + z2 * sp) * lit(1.0 / D2R)
        val lon = normLonCol(
          atan2(negate(y2), negate(x2) * sp + z2 * cp) * lit(1.0 / D2R) +
            lit(m.poleLon))
        (lat, lon)
    }

  /** C6 over a CF grid mapping — projected `northing`/`easting` columns. */
  def assignCrs(df: DataFrame, latCol: String, lonCol: String,
      gm: GridMapping): DataFrame = {
    val (n, e) = project(col(latCol), col(lonCol), gm)
    df.withColumn("northing", n).withColumn("easting", e)
  }

  /** W15 — the CF grid-mapping attrs for a parameterized mapping
    * (conventions.py:44-199 writes the same keys from pyproj's CF dict). */
  def cfAttrs(gm: GridMapping): Map[String, String] = gm match {
    case m: LambertConformalConic => Map(
      "grid_mapping_name" -> "lambert_conformal_conic",
      "standard_parallel" -> (if (m.lat1 == m.lat2) s"${m.lat1}" else s"${m.lat1},${m.lat2}"),
      "latitude_of_projection_origin" -> s"${m.lat0}",
      "longitude_of_central_meridian" -> s"${m.lon0}",
      "earth_radius" -> s"${m.radius}")
    case m: PolarStereographic => Map(
      "grid_mapping_name" -> "polar_stereographic",
      "latitude_of_projection_origin" -> (if (m.northPole) "90.0" else "-90.0"),
      "straight_vertical_longitude_from_pole" -> s"${m.lon0}",
      "standard_parallel" -> s"${m.latTs}",
      "earth_radius" -> s"${m.radius}")
    case m: Mercator => Map(
      "grid_mapping_name" -> "mercator",
      "longitude_of_projection_origin" -> s"${m.lon0}",
      "standard_parallel" -> s"${m.latTs}",
      "earth_radius" -> s"${m.radius}")
    case m: RotatedPole => Map(
      "grid_mapping_name" -> "rotated_latitude_longitude",
      "grid_north_pole_latitude" -> s"${m.poleLat}",
      "grid_north_pole_longitude" -> s"${m.poleLon}",
      "north_pole_grid_longitude" -> s"${m.angle}",
      "earth_radius" -> s"${m.radius}")
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

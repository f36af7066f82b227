package graft.model

/** Temporal-resolution value objects.
  *
  * Scala re-expression of the reference's `TimeUnit`/`TimeSpan` model
  * (gridded_etl_tools/utils/time.py:9-209): fixed-duration units convert to
  * minutes; months/years/seasons refuse conversion (variable length).
  */
sealed abstract class TimeUnitKind(val name: String, val minutesPerUnit: Option[Long]) {
  override def toString: String = name
}

object TimeUnitKind {
  case object Minutes extends TimeUnitKind("minutes", Some(1L))
  case object Hours   extends TimeUnitKind("hours", Some(60L))
  case object Days    extends TimeUnitKind("days", Some(24L * 60))
  case object Weeks   extends TimeUnitKind("weeks", Some(7L * 24 * 60))
  case object Months  extends TimeUnitKind("months", None)
  case object Years   extends TimeUnitKind("years", None)
  case object Seasons extends TimeUnitKind("seasons", None)

  val all: Seq[TimeUnitKind] = Seq(Minutes, Hours, Days, Weeks, Months, Years, Seasons)

  def fromName(n: String): TimeUnitKind = {
    val plural = if (n.endsWith("s")) n else n + "s"
    all.find(_.name == plural).getOrElse(
      throw new IllegalArgumentException(
        s"Invalid time unit: $n. Must be one of ${all.map(_.name).mkString(", ")}"))
  }
}

/** A span of `value` × `unit`, e.g. TimeSpan(Days, 1) == "daily".
  *
  * Parity with time.py:89-209 (`from_string`, `to_minutes`, ordering by
  * minutes, refusal to convert months/years/seasons to fixed durations).
  */
final case class TimeSpan(unit: TimeUnitKind, value: Int) extends Ordered[TimeSpan] {
  require(value > 0, s"Time unit value must be positive, got $value")

  /** Minutes in this span; months/years/seasons raise (time.py:63-74). */
  def toMinutes: Long = unit.minutesPerUnit match {
    case Some(m) => m * value
    case None =>
      throw new IllegalArgumentException(
        s"Cannot convert ${unit.name} to minutes as ${unit.name} is not of a fixed duration")
  }

  def toMillis: Long = toMinutes * 60000L

  /** Spark SQL interval literal body, usable in `sequence(a, b, interval ...)`. */
  def intervalExpr: String = s"interval $value ${unit.name}"

  override def compare(that: TimeSpan): Int = toMinutes.compare(that.toMinutes)

  override def toString: String =
    TimeSpan.predefined.collectFirst { case (s, ts) if ts == this => s }
      .getOrElse(s"$value${unit.name}")
}

object TimeSpan {
  import TimeUnitKind._

  val HalfHourly: TimeSpan = TimeSpan(Minutes, 30)
  val Hourly: TimeSpan     = TimeSpan(Hours, 1)
  val ThreeHourly: TimeSpan = TimeSpan(Hours, 3)
  val SixHourly: TimeSpan  = TimeSpan(Hours, 6)
  val Daily: TimeSpan      = TimeSpan(Days, 1)
  val Weekly: TimeSpan     = TimeSpan(Weeks, 1)
  val Monthly: TimeSpan    = TimeSpan(Months, 1)
  val Yearly: TimeSpan     = TimeSpan(Years, 1)
  val Seasonal: TimeSpan   = TimeSpan(Seasons, 1)

  /** Predefined aliases (time.py:95-106, incl. legacy 3hourly/6hourly). */
  val predefined: Map[String, TimeSpan] = Map(
    "half_hourly" -> HalfHourly,
    "hourly"      -> Hourly,
    "3hourly"     -> ThreeHourly,
    "6hourly"     -> SixHourly,
    "daily"       -> Daily,
    "weekly"      -> Weekly,
    "monthly"     -> Monthly,
    "yearly"      -> Yearly,
    "seasonal"    -> Seasonal,
  )

  private val ArbitraryPattern =
    "^(\\d+)(minutes?|hours?|days?|weeks?|months?|years?|seasons?)$".r

  /** Parse "daily", "15minutes", "2hours", ... (time.py:127-168). */
  def fromString(s: String): TimeSpan =
    predefined.get(s).orElse {
      s.toLowerCase match {
        case ArbitraryPattern(v, u) => Some(TimeSpan(TimeUnitKind.fromName(u), v.toInt))
        case _ => None
      }
    }.getOrElse {
      throw new IllegalArgumentException(
        s"Invalid time span string: '$s'. Must be one of: " +
          predefined.keys.toSeq.sorted.mkString(", ") + " or a pattern like '15minutes'")
    }
}

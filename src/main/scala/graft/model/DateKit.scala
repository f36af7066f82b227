package graft.model

import java.time.{LocalDate, LocalDateTime}
import java.time.format.DateTimeFormatter

/** C10/C12/C13 — the date/string/path scalar kit
  * (utils/convenience.py:44-163, 235-265, 323-363, 435-471).
  *
  * Pure Scala: these run driver-side around the engine (attrs assembly,
  * store paths); in-query date math uses the Spark built-ins
  * (`date_format`, `to_timestamp`, `current_date`) directly.
  */
object DateKit {

  /** `%Y%m%d%H` — the attrs `date range` wire format (metadata.py:870-921). */
  val RangeFormat: DateTimeFormatter = DateTimeFormatter.ofPattern("yyyyMMddHH")

  /** C10 — (start, end) → `%Y%m%d%H` strings (convenience.py:323-343). */
  def dateRangeToString(range: (LocalDateTime, LocalDateTime)): (String, String) =
    (range._1.format(RangeFormat), range._2.format(RangeFormat))

  /** C10 — `%Y%m%d%H` strings → (start, end) (convenience.py:345-363). */
  def stringsToDateRange(range: (String, String)): (LocalDateTime, LocalDateTime) = {
    def parse(s: String) = LocalDate
      .parse(s.take(8), DateTimeFormatter.BASIC_ISO_DATE)
      .atTime(s.drop(8).toInt, 0)
    (parse(range._1), parse(range._2))
  }

  /** C10 — today in ISO format (convenience.py:250-261). */
  def today(clock: java.time.Clock = java.time.Clock.systemUTC()): String =
    LocalDate.now(clock).toString

  /** C13 — deterministic store identity `{name}-{resolution}`
    * (convenience.py:56-75 `key()`). */
  def key(datasetName: String, timeResolution: TimeSpan): String =
    s"$datasetName-$timeResolution"

  /** C13 — date-formatted folder segment for an output path
    * (convenience.py:117-143 `get_folder_path_from_date`). */
  def folderPathFromDate(root: String, date: LocalDateTime): String =
    s"$root/${date.format(DateTimeFormatter.ofPattern("yyyyMMddHH"))}"

  /** C13 — canonical store path `{root}/{name}-{resolution}`
    * (convenience.py:44-53). */
  def storePath(root: String, datasetName: String, timeResolution: TimeSpan): String =
    s"$root/${key(datasetName, timeResolution)}"

  /** C12 — JSON string → UTF-8 bytes (convenience.py:457-471). */
  def jsonToBytes(json: String): Array[Byte] = json.getBytes("UTF-8")
}

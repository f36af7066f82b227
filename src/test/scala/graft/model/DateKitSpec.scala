package graft.model

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

/** C10/C12/C13 — date/string/path kit (convenience.py parity). */
class DateKitSpec extends AnyFunSuite {

  test("date range round-trips through %Y%m%d%H strings") {
    val r = (LocalDateTime.parse("2024-01-05T06:00:00"),
      LocalDateTime.parse("2025-12-31T23:00:00"))
    val s = DateKit.dateRangeToString(r)
    assert(s == ("2024010506", "2025123123"))
    assert(DateKit.stringsToDateRange(s) == r)
  }

  test("today follows the supplied clock (ISO format)") {
    val clock = java.time.Clock.fixed(
      java.time.Instant.parse("2026-08-12T10:00:00Z"), java.time.ZoneOffset.UTC)
    assert(DateKit.today(clock) == "2026-08-12")
  }

  test("key and store path are deterministic {name}-{resolution}") {
    assert(DateKit.key("chirps_final_25", TimeSpan.Daily) == "chirps_final_25-daily")
    assert(DateKit.storePath("/data", "era5", TimeSpan.Hourly) == "/data/era5-hourly")
  }

  test("folder path formats the date segment") {
    assert(DateKit.folderPathFromDate("/out", LocalDateTime.parse("2024-03-07T09:00:00"))
      == "/out/2024030709")
  }

  test("jsonToBytes is UTF-8") {
    assert(DateKit.jsonToBytes("""{"a":"é"}""").length == 10)
  }
}

package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Parity with the reference's time model (utils/time.py:89-209). */
class TimeSpanSpec extends AnyFunSuite {

  test("predefined aliases parse") {
    assert(TimeSpan.fromString("daily") == TimeSpan.Daily)
    assert(TimeSpan.fromString("hourly") == TimeSpan.Hourly)
    assert(TimeSpan.fromString("half_hourly") == TimeSpan.HalfHourly)
    assert(TimeSpan.fromString("3hourly") == TimeSpan.ThreeHourly)
    assert(TimeSpan.fromString("6hourly") == TimeSpan.SixHourly)
    assert(TimeSpan.fromString("weekly") == TimeSpan.Weekly)
    assert(TimeSpan.fromString("monthly") == TimeSpan.Monthly)
    assert(TimeSpan.fromString("yearly") == TimeSpan.Yearly)
    assert(TimeSpan.fromString("seasonal") == TimeSpan.Seasonal)
  }

  test("arbitrary spans parse with singular and plural units") {
    assert(TimeSpan.fromString("15minutes") == TimeSpan(TimeUnitKind.Minutes, 15))
    assert(TimeSpan.fromString("1minute") == TimeSpan(TimeUnitKind.Minutes, 1))
    assert(TimeSpan.fromString("2hours") == TimeSpan(TimeUnitKind.Hours, 2))
    assert(TimeSpan.fromString("10days") == TimeSpan(TimeUnitKind.Days, 10))
  }

  test("invalid strings raise") {
    assertThrows[IllegalArgumentException](TimeSpan.fromString("fortnightly"))
    assertThrows[IllegalArgumentException](TimeSpan.fromString("0days"))
    assertThrows[IllegalArgumentException](TimeSpan.fromString(""))
  }

  test("toMinutes for fixed-duration units") {
    assert(TimeSpan.Daily.toMinutes == 1440L)
    assert(TimeSpan.Hourly.toMinutes == 60L)
    assert(TimeSpan.Weekly.toMinutes == 7L * 1440)
    assert(TimeSpan(TimeUnitKind.Minutes, 15).toMinutes == 15L)
  }

  test("months/years/seasons refuse minute conversion (time.py:63-74)") {
    assertThrows[IllegalArgumentException](TimeSpan.Monthly.toMinutes)
    assertThrows[IllegalArgumentException](TimeSpan.Yearly.toMinutes)
    assertThrows[IllegalArgumentException](TimeSpan.Seasonal.toMinutes)
  }

  test("ordering compares by minutes") {
    assert(TimeSpan.Hourly < TimeSpan.Daily)
    assert(TimeSpan(TimeUnitKind.Hours, 24) == TimeSpan(TimeUnitKind.Hours, 24))
    assert(TimeSpan(TimeUnitKind.Hours, 24).compare(TimeSpan.Daily) == 0)
  }

  test("positive-value invariant") {
    assertThrows[IllegalArgumentException](TimeSpan(TimeUnitKind.Days, 0))
    assertThrows[IllegalArgumentException](TimeSpan(TimeUnitKind.Days, -1))
  }

  test("round-trips every predefined alias") {
    TimeSpan.predefined.foreach { case (name, span) =>
      assert(TimeSpan.fromString(name) == span)
    }
  }
}

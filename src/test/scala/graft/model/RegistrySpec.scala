package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** O5 — registry lookup semantics (dataset_manager.py:494-534 parity). */
class RegistrySpec extends AnyFunSuite {

  private def desc(name: String, res: TimeSpan) =
    DatasetDescriptor(name, "value", timeResolution = res)

  test("lookup by name, disambiguated by time resolution") {
    val r = new Registry[DatasetDescriptor]
    r.register("chirps", TimeSpan.Daily, desc("chirps", TimeSpan.Daily))
    r.register("chirps", TimeSpan.Weekly, desc("chirps", TimeSpan.Weekly))
    assert(r.get("chirps", Some(TimeSpan.Daily)).map(_.timeResolution)
      == Some(TimeSpan.Daily))
    assert(r.get("chirps", Some(TimeSpan.Weekly)).map(_.timeResolution)
      == Some(TimeSpan.Weekly))
    // unqualified lookup with several same-name entries is ambiguous
    assertThrows[IllegalArgumentException](r.get("chirps"))
  }

  test("miss returns None, not a throw (reference warns and returns None)") {
    val r = new Registry[DatasetDescriptor]
    assert(r.get("nope") == None)
    r.register("era5", TimeSpan.Hourly, desc("era5", TimeSpan.Hourly))
    assert(r.get("era5", Some(TimeSpan.Daily)) == None)
  }

  test("unresolved registration acts as a fallback for any resolution") {
    val r = new Registry[DatasetDescriptor]
    r.register("prism", desc("prism", TimeSpan.Daily))
    assert(r.get("prism", Some(TimeSpan.Weekly)).isDefined)
    assert(r.names == Set("prism"))
  }
}

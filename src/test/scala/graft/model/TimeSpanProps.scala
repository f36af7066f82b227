package graft.model

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck invariants for the temporal model (SURVEY §7 step 1). */
object TimeSpanProps extends Properties("TimeSpan") {

  private val fixedUnits =
    Gen.oneOf(TimeUnitKind.Minutes, TimeUnitKind.Hours, TimeUnitKind.Days, TimeUnitKind.Weeks)
  private val anyUnit = Gen.oneOf(TimeUnitKind.all)
  private val posValue = Gen.chooseNum(1, 10000)

  property("fromString round-trips arbitrary fixed spans") =
    Prop.forAll(fixedUnits, posValue) { (u, v) =>
      val parsed = TimeSpan.fromString(s"$v${u.name}")
      parsed.unit == u && parsed.value == v
    }

  property("toMinutes is linear in value") =
    Prop.forAll(fixedUnits, posValue) { (u, v) =>
      TimeSpan(u, v).toMinutes == v.toLong * TimeSpan(u, 1).toMinutes
    }

  property("ordering is consistent with minutes") =
    Prop.forAll(fixedUnits, posValue, fixedUnits, posValue) { (u1, v1, u2, v2) =>
      val (a, b) = (TimeSpan(u1, v1), TimeSpan(u2, v2))
      (a < b) == (a.toMinutes < b.toMinutes)
    }

  property("variable-length units always refuse toMinutes") =
    Prop.forAll(Gen.oneOf(TimeUnitKind.Months, TimeUnitKind.Years, TimeUnitKind.Seasons),
      posValue) { (u, v) =>
      Prop.throws(classOf[IllegalArgumentException])(TimeSpan(u, v).toMinutes)
    }

  property("non-positive values rejected") =
    Prop.forAll(anyUnit, Gen.chooseNum(-10000, 0)) { (u, v) =>
      Prop.throws(classOf[IllegalArgumentException])(TimeSpan(u, v))
    }
}

package graft.model

/** Dataset category → dimension-set mapping.
  *
  * Mirrors the reference's `set_key_dims` dispatch
  * (gridded_etl_tools/utils/transform.py:724-759) and the
  * `dataset_category` attribute (utils/attributes.py:223-233): the category
  * fixes which key columns a long-form grid DataFrame carries.
  */
sealed trait DatasetCategory {
  /** The dimension holding "time" for update planning. */
  def timeDim: String
  /** Non-spatial dims, in standard order, before the spatial dims. */
  def leadingDims: Seq[String]
  def standardDims(spatialDims: Seq[String]): Seq[String] = leadingDims ++ spatialDims
}

object DatasetCategory {
  case object Observation extends DatasetCategory {
    val timeDim = "time"
    val leadingDims = Seq("time")
  }
  case object Forecast extends DatasetCategory {
    val timeDim = "forecast_reference_time"
    val leadingDims = Seq("forecast_reference_time", "step")
  }
  case object Ensemble extends DatasetCategory {
    val timeDim = "forecast_reference_time"
    val leadingDims = Seq("forecast_reference_time", "step", "ensemble")
  }
  case object Hindcast extends DatasetCategory {
    val timeDim = "hindcast_reference_time"
    val leadingDims =
      Seq("hindcast_reference_time", "forecast_reference_offset", "step", "ensemble")
  }

  def fromString(s: String): DatasetCategory = s match {
    case "observation" => Observation
    case "forecast"    => Forecast
    case "ensemble"    => Ensemble
    case "hindcast"    => Hindcast
    case other => throw new IllegalArgumentException(s"Unknown dataset category: $other")
  }
}

/** Declarative per-dataset schema/config — the Scala analog of the reference's
  * class-attribute system (gridded_etl_tools/utils/attributes.py:101-434).
  *
  * Where the reference fails at construction on missing abstract attributes
  * (attributes.py:13-29), here required fields are constructor parameters.
  */
final case class DatasetDescriptor(
    datasetName: String,
    dataVar: String,
    category: DatasetCategory = DatasetCategory.Observation,
    spatialDims: Seq[String] = Seq("latitude", "longitude"),
    timeResolution: TimeSpan = TimeSpan.Daily,
    /** Provider sentinel rewritten to NaN at scan (attributes, chirps.py:122-126). */
    missingValue: Option[Double] = None,
    hasNans: Boolean = false,
    expectedNanFrequency: Option[Double] = None,
    /** (lower, upper) cadence bounds for irregular datasets (attributes.py:250-257). */
    updateCadenceBounds: Option[(TimeSpan, TimeSpan)] = None,
    /** Decimal places for bbox rounding (attributes.py:279-282). */
    bboxRounding: Int = 5,
    /** Physical unit of the data variable, for extreme-value QC (attributes.py:328-331). */
    unitOfMeasurement: Option[String] = None,
    /** Tolerance for nearest-neighbor coordinate selection (attributes.py:333-338). */
    selectionTolerance: Double = 0.01,
    datasetStartDate: Option[java.time.Instant] = None,
    /** Free-form static metadata merged into the store attrs (metadata.py:870-921). */
    staticMetadata: Map[String, String] = Map.empty,
) {
  def timeDim: String = category.timeDim
  def standardDims: Seq[String] = category.standardDims(spatialDims)
  /** All key columns + the value column, in canonical order (transform.py:670-673). */
  def columns: Seq[String] = standardDims :+ dataVar
}

// O5 registry: see [[graft.model.Registry]] (generic name + time-resolution
// lookup; `Registry.descriptors` is the process-wide descriptor instance).

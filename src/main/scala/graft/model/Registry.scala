package graft.model

/** O5 — runtime descriptor/manager registry
  * (dataset_manager.py:494-534): resolve a registered entry by
  * `datasetName`, optionally disambiguated by time resolution when several
  * entries share a name.
  *
  * The reference walks Python subclasses reflectively; the JVM analog is an
  * explicit registration map — same lookup contract, no classpath scanning.
  */
final class Registry[T] {

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[(String, Option[TimeSpan]), T]()

  def register(name: String, timeResolution: TimeSpan, value: T): Unit =
    entries.put((name, Some(timeResolution)), value)

  def register(name: String, value: T): Unit =
    entries.put((name, None), value)

  /** Lookup by name; `timeResolution` differentiates same-name entries
    * (dataset_manager.py:524-530). Returns None (with no throw) on a miss,
    * like the reference's warn-and-None — but an AMBIGUOUS unqualified
    * lookup throws rather than returning a hash-order-arbitrary entry. */
  def get(name: String, timeResolution: Option[TimeSpan] = None): Option[T] = {
    import scala.jdk.CollectionConverters._
    timeResolution match {
      case Some(res) =>
        Option(entries.get((name, Some(res))))
          .orElse(Option(entries.get((name, None))))
      case None =>
        Option(entries.get((name, None))).orElse {
          val hits = entries.asScala.collect { case ((n, _), v) if n == name => v }.toSeq
          if (hits.size > 1)
            throw new IllegalArgumentException(
              s"Multiple entries named '$name'; qualify with a time resolution")
          hits.headOption
        }
    }
  }

  def names: Set[String] = {
    import scala.jdk.CollectionConverters._
    entries.asScala.keys.map(_._1).toSet
  }
}

object Registry {
  /** Process-wide descriptor registry, the usual composition point. */
  val descriptors: Registry[DatasetDescriptor] = new Registry[DatasetDescriptor]
}

package graft

import org.slf4j.{Logger, LoggerFactory}

/** O6 — per-dataset logging mixin (utils/logging.py:8-256): messages carry
  * the dataset identity; level routing/file handlers are log4j2
  * configuration, not code. */
trait Logging {
  /** Dataset identity stamped on every message. */
  def logName: String

  @transient protected lazy val log: Logger =
    LoggerFactory.getLogger(s"graft.${logName}")

  protected def info(msg: => String): Unit = if (log.isInfoEnabled) log.info(msg)
  protected def debug(msg: => String): Unit = if (log.isDebugEnabled) log.debug(msg)
  protected def warn(msg: => String): Unit = log.warn(msg)
  protected def error(msg: => String, t: Throwable = null): Unit =
    if (t == null) log.error(msg) else log.error(msg, t)
}

package graft

import java.io.{FileWriter, PrintWriter}
import java.time.format.DateTimeFormatter

import org.slf4j.{Logger, LoggerFactory}

/** O6 — per-dataset logging mixin (utils/logging.py:8-256): messages carry
  * the dataset identity and — when `logFilePath` is set — also append to a
  * per-dataset log file with timestamps, the analog of the reference's
  * per-dataset INFO/DEBUG FileHandlers. slf4j routing stays the backend's
  * (log4j2) configuration.
  */
trait Logging {
  /** Dataset identity stamped on every message. */
  def logName: String

  /** Per-dataset log file (logging.py:64-132's `<dataset>.log`); None (the
    * default) keeps logging purely on slf4j. */
  protected def logFilePath: Option[String] = None

  @transient protected lazy val log: Logger =
    LoggerFactory.getLogger(s"graft.${logName}")

  @transient private lazy val fileSink: Option[PrintWriter] =
    logFilePath.map { p =>
      val f = new java.io.File(p)
      Option(f.getParentFile).foreach(_.mkdirs())
      new PrintWriter(new FileWriter(f, true), true)
    }

  private def toFile(level: String, msg: String): Unit = fileSink.foreach { w =>
    val ts = java.time.LocalDateTime.now()
      .format(DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    w.println(s"$ts $level graft.$logName: $msg")
  }

  protected def info(msg: => String): Unit = {
    // evaluate the by-name msg at most once, and not at all when the level
    // is off and no file sink will consume it
    lazy val m = msg
    if (log.isInfoEnabled) log.info(m)
    if (fileSink.isDefined) toFile("INFO", m)
  }
  protected def debug(msg: => String): Unit = {
    lazy val m = msg
    if (log.isDebugEnabled) log.debug(m)
    if (fileSink.isDefined) toFile("DEBUG", m)
  }
  protected def warn(msg: => String): Unit = {
    log.warn(msg)
    toFile("WARN", msg)
  }
  protected def error(msg: => String, t: Throwable = null): Unit = {
    if (t == null) log.error(msg) else log.error(msg, t)
    toFile("ERROR", if (t == null) msg else s"$msg: ${t}")
    // the per-dataset file must carry the full trace like the slf4j side —
    // it is the log someone reads when diagnosing that dataset
    if (t != null) fileSink.foreach(t.printStackTrace)
  }
}

object Logging {
  private var hookInstalled = false

  /** The reference's `sys.excepthook` analog (logging.py:134-256): route
    * uncaught driver-thread exceptions through a logger before the JVM's
    * default handling. Idempotent — repeat calls are no-ops, so two entry
    * points can't build a chain that logs each exception twice. Chains to
    * the handler present at first install. */
  def installExcepthook(logger: Logger =
      LoggerFactory.getLogger("graft.uncaught")): Unit = synchronized {
    if (hookInstalled) return
    hookInstalled = true
    val prior = Thread.getDefaultUncaughtExceptionHandler
    Thread.setDefaultUncaughtExceptionHandler(new Thread.UncaughtExceptionHandler {
      override def uncaughtException(t: Thread, e: Throwable): Unit = {
        logger.error(s"Uncaught exception in thread ${t.getName}", e)
        if (prior != null) prior.uncaughtException(t, e)
      }
    })
  }
}

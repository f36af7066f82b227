package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class LoggingSpec extends AnyFunSuite {

  test("per-dataset log file receives timestamped messages (logging.py:64-132)") {
    val dir = Files.createTempDirectory("logspec")
    val path = dir.resolve("chirps_test.log").toString
    val obj = new Logging {
      def logName: String = "chirps_test"
      override protected def logFilePath: Option[String] = Some(path)
      def run(): Unit = { info("hello"); warn("watch out"); error("boom") }
    }
    obj.run()
    val lines = Files.readAllLines(java.nio.file.Paths.get(path))
    assert(lines.size == 3)
    assert(lines.get(0).contains("INFO graft.chirps_test: hello"))
    assert(lines.get(1).contains("WARN graft.chirps_test: watch out"))
    assert(lines.get(2).contains("ERROR graft.chirps_test: boom"))
    assert(lines.get(0).matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2} .*"""))
  }

  test("no file sink configured → slf4j only, no file created") {
    val obj = new Logging {
      def logName: String = "nofile"
      def run(): Unit = info("quiet")
    }
    obj.run() // must not throw
  }

  test("excepthook chains and logs uncaught exceptions (logging.py:134-256)") {
    val prior = Thread.getDefaultUncaughtExceptionHandler
    try {
      @volatile var chained = false
      Thread.setDefaultUncaughtExceptionHandler(
        new Thread.UncaughtExceptionHandler {
          override def uncaughtException(t: Thread, e: Throwable): Unit =
            chained = true
        })
      Logging.installExcepthook()
      val t = new Thread(() => throw new RuntimeException("uncaught test"))
      t.start(); t.join()
      assert(chained) // prior handler still ran after the logging hook
    } finally Thread.setDefaultUncaughtExceptionHandler(prior)
  }
}

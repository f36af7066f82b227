package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // One-bench-per-JVM is guaranteed by `run / fork := true`, but a
    // JUST-EXITED Spark JVM in the same shell pipeline (verify, compile,
    // a prior bench) leaves GC/page-cache churn that reads ~10-40% high
    // (SCALING.md §methodology). Wait — bounded — for the 1-minute load
    // average to settle before the timed section; skip via
    // SPARK_GRAFT_NO_QUIESCE=1 for quick local iteration.
    if (!sys.env.contains("SPARK_GRAFT_NO_QUIESCE")) {
      val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      val target = math.max(2.0, cpus.toDouble / 2)
      var waitedMs = 0L
      while (os.getSystemLoadAverage > target && waitedMs < 90000L) {
        Thread.sleep(3000); waitedMs += 3000
      }
      if (waitedMs > 0)
        System.err.println(s"[bench] waited ${waitedMs / 1000}s for system " +
          s"load (now ${os.getSystemLoadAverage}) to settle under $target")
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/parquet-footer paths so the first timed query
    // doesn't absorb session initialization: one tiny representative query
    // per subsystem (scan+agg, text HOFs, embedding HOFs, and — r15 — the
    // parquet WRITE/commit path: its JIT was landing on whichever write-
    // family query sorts first and inflating it 1-2 s; see
    // OPTIMIZATION_r15.md "warmup order").
    try {
      Seq("q18_date_range", "q33_token_stats", "q40_embed_norms",
          "q44_store_attrs").foreach { q =>
        SparkEntry.queries(q)(spark, sfDir).count()
      }
    } catch { case _: Throwable => () }
    Housekeeping.releaseAll(spark, blocking = true)
    // Deterministic (sorted) execution order: per-query timings stay
    // comparable across rounds even as the query map grows (Map iteration
    // order reshuffles whenever entries are added).
    // local-iteration filter (comma-separated names); the driver sets no
    // filter and always times the full board
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    // SPARK_GRAFT_BENCH_RUNS=N times each query N times and reports the
    // MIN — the variance-pinning mode behind SCALING.md's per-query
    // baseline (GC/JIT bands smear single runs ±30%; the min is the
    // stable plan-cost estimator). Default 1: the driver's number stays
    // a single cold run, comparable across rounds.
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.trim) match {
      case None | Some("") => 1
      case Some(v) => v.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"SPARK_GRAFT_BENCH_RUNS '$v' is not an integer"))
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t = (0 until math.max(1, runs)).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        // queries are independent: sweep residual checkpoint/cache blocks
        // so no run is timed under another's storage-memory pressure;
        // blocking: removal must FINISH before the next timer starts
        if (!sys.env.contains("SPARK_GRAFT_NO_SWEEP"))
          Housekeeping.releaseAll(spark, blocking = true)
        dt
      }.min
      name -> t
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

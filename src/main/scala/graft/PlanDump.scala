package graft

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for named [[SparkEntry.queries]] — the
  * generator behind PLANS.md. Usage:
  * {{{ runMain graft.PlanDump <sfDir> <name>[,<name>…] }}} */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <q1,q2,…>")
    val spark = SparkSession.builder()
      .appName("graft-plandump")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR") // keep plan output copy-pastable
    try args(1).split(",").foreach { name =>
      val df = SparkEntry.queries(name)(spark, args(0))
      println(s"===== $name =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    } finally spark.stop()
  }
}

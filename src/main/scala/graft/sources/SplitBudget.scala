package graft.sources

/** Split-size budget shared by the record-granular DSv2 scans (GRIB
  * messages, GeoTIFF tiles): Spark's `FilePartition.maxSplitBytes` sizing
  * formula, driven by the session's `spark.sql.files.*` confs — so local
  * runs coalesce tiny units into a handful of tasks and a 100 TB archive
  * fans out into ~`maxPartitionBytes`-sized tasks, with no constant tuned
  * for either deployment (guide §6 input split size, §2.2 fewer/larger
  * map tasks). `totalBytes` should already include the per-file open cost
  * the caller charges. */
object SplitBudget {
  def maxSplitBytes(totalBytes: Long): Long = {
    val sqlConf = org.apache.spark.sql.internal.SQLConf.get
    val maxPartitionBytes = sqlConf.filesMaxPartitionBytes
    val openCost = sqlConf.filesOpenCostInBytes
    val minPartitionNum = sqlConf.filesMinPartitionNum.getOrElse(
      org.apache.spark.sql.SparkSession.active.sparkContext.defaultParallelism)
    math.min(maxPartitionBytes,
      math.max(openCost, totalBytes / math.max(1, minPartitionNum)))
  }

  def openCostInBytes: Long =
    org.apache.spark.sql.internal.SQLConf.get.filesOpenCostInBytes
}

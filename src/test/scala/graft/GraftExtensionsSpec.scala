package graft

import graft.SparkSpec

/** SQL-surface registration of the native expressions (on the shared
  * session via GraftExtensions.register — the extensions-class path is the
  * same builder list applied at session construction). */
class GraftExtensionsSpec extends SparkSpec {

  test("shingle_pair_hashes callable from SQL, matches the Scala API") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT shingle_pair_hashes('one two three four', 3).a AS a").head().getSeq[Long](0)
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.col
    val viaApi = Seq("one two three four").toDF("t")
      .select(graft.functions.Dedup.shinglePairHashes(col("t"), 3).getField("a"))
      .head().getSeq[Long](0)
    assert(viaSql == viaApi && viaSql.length == 2)
  }

  test("vector_dot callable from SQL") {
    GraftExtensions.register(spark)
    val v = spark.sql(
      "SELECT vector_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head().getDouble(0)
    assert(v == 11.0)
  }

  test("wrong arity raises") {
    GraftExtensions.register(spark)
    assertThrows[Exception](
      spark.sql("SELECT vector_dot(array(CAST(1.0 AS FLOAT)))").collect())
  }
}

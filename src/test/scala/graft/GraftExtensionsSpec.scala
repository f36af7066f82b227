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

  test("simhash64 and srp_bucket callable from SQL, match the Scala API") {
    GraftExtensions.register(spark)
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.col
    val viaSql = spark.sql("SELECT simhash64('the quick brown fox') AS h")
      .head().getLong(0)
    val viaApi = Seq("the quick brown fox").toDF("t")
      .select(graft.functions.Dedup.simhash64(col("t"))).head().getLong(0)
    assert(viaSql == viaApi)
    val bSql = spark.sql(
      "SELECT srp_bucket(array(CAST(0.5 AS FLOAT), CAST(-1.5 AS FLOAT)), 2, 8) AS b")
      .head().getLong(0)
    val bApi = Seq(Seq(0.5f, -1.5f)).toDF("v")
      .select(graft.functions.Similarity.srpBucket(col("v"), 2, 8))
      .head().getLong(0)
    assert(bSql == bApi)
  }

  test("minhash_signature callable from SQL, matches the Scala API") {
    GraftExtensions.register(spark)
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.col
    val viaSql = spark.sql(
      "SELECT minhash_signature('one two three four five', 3, 16) AS s")
      .head().getSeq[Long](0)
    val viaApi = graft.functions.Dedup.minhashSignatures(
        Seq((1L, "one two three four five")).toDF("id", "t"), "id", "t", 3, 16)
      .select("sig").head().getSeq[Long](0)
    assert(viaSql == viaApi && viaSql.length == 16)
  }
}

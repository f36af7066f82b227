package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`); explicit salting remains the
  * tool when one side must stay a shuffle join and a handful of keys
  * dominate (the "most common shingle" shape in inverted-index joins).
  */
object Skew {

  /** Salted equi-join: the large side gets a deterministic salt derived
    * from its row content; the small side is replicated `salt` ways so
    * every (key, salt) bucket exists. A key holding p% of the rows spreads
    * across `salt` tasks instead of one.
    *
    * Join type is inner/left-semi style only — outer joins would need
    * post-join de-replication. The salt column never leaves this function.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    require(Set("inner", "left_semi", "leftsemi").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left_semi, got $joinType")
    val l = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(salt.toLong)))
    val replicas = explode(array((0 until salt).map(i => lit(i.toLong)): _*))
    val s = small.withColumn("__salt", replicas)
    l.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}

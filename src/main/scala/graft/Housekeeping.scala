package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle control for checkpointed frames.
  *
  * Iterative operators ([[functions.Dedup.connectedComponents]],
  * [[functions.Graph.pageRank]], …) truncate lineage per round with eager
  * `localCheckpoint`s. A checkpointed frame's blocks live in the block
  * manager until explicitly unpersisted — and `Dataset.unpersist` does NOT
  * release them (it only talks to the CacheManager, which never saw the
  * checkpoint RDD). Left alone, every superseded round's blocks stay
  * resident for the life of the session; in a long multi-query session (or
  * a week-long 100 TB curation job) dead checkpoint blocks crowd out live
  * ones and the block manager starts evicting/spilling. The contract here:
  *
  *   - each operator releases every INTERMEDIATE frame as soon as its
  *     successor is materialized, and leaves AT MOST ONE persisted frame —
  *     the returned result — for the caller;
  *   - callers that are done with a result release it via [[release]], or
  *     sweep the whole session between independent queries via
  *     [[releaseAll]] (what `Bench`/`Verify` do after every query).
  */
object Housekeeping {

  /** Release the checkpoint/persisted blocks BACKING `df`: unpersists the
    * RDD under every `LogicalRDD` leaf of the analyzed plan (the node a
    * `localCheckpoint` produces). Safe on frames whose plan merely builds
    * on a checkpoint — the shared leaf is released, so only call this once
    * every consumer of that checkpoint is finished. Non-blocking. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Unpersist EVERY resident RDD in the session — cached datasets and
    * local checkpoints alike. Correct only at a quiescent point: between
    * independent queries, after the previous query's output is fully
    * consumed (a released local checkpoint cannot be recomputed). Returns
    * the number of RDDs released. Pass `blocking = true` when the NEXT
    * thing is timed (Bench/Verify do): a non-blocking sweep can still be
    * dropping gigabytes of blocks while the next query runs. */
  def releaseAll(spark: SparkSession, blocking: Boolean = false): Int = {
    val resident = spark.sparkContext.getPersistentRDDs
    resident.valuesIterator.foreach(_.unpersist(blocking))
    resident.size
  }
}

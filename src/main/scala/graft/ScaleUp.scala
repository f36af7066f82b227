package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a larger scale factor from an existing testdata dir by
  * replication — the empirical companion to SCALING.md: the driver ships
  * sf ≤ 0.1, so sf0.1→sfX ratios measured over this output are the
  * evidence that no query scales super-linearly.
  *
  * `runMain graft.ScaleUp <srcDir> <dstDir> [replicas=10]`
  *
  * Replication rules keep the data SHAPED like a bigger corpus rather
  * than a pathological one:
  *  - key columns offset per replica (FK consistency preserved:
  *    orders.o_custkey moves with customer.c_custkey, lineitem's keys
  *    with orders/part/supplier, events.user_id with event_id space);
  *  - fixed-cardinality dims (region, nation) copy verbatim;
  *  - document TEXT is word-shuffled per replica (deterministic keyed
  *    sort) — token statistics survive but shingles don't, so replicas
  *    are NOT near-duplicates and pair-generating queries scale with
  *    corpus size instead of quadratically in the replica count;
  *  - embeddings get small deterministic per-replica noise (~±1%) for
  *    the same reason (exact/near-dup pairs don't explode), cluster
  *    structure survives;
  *  - timestamps are NOT shifted: a 10× corpus over the same time span
  *    (10× daily density) is the realistic growth shape, and the
  *    fixture-deriving queries keep their day-count-driven fixtures.
  */
object ScaleUp {
  /** Key offset between replicas — far above any sf0.1 key. */
  val Off = 100000000L

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <srcDir> <dstDir> [replicas]")
    val src = args(0); val dst = args(1)
    val replicas = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-scaleup").getOrCreate()

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(t: String, df: DataFrame): Unit = {
      df.repartition(32).write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"$t: ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }
    def rep(t: String)(f: (DataFrame, Int) => DataFrame): Unit =
      write(t, (0 until replicas).map(i => f(read(t), i)).reduce(_ unionByName _))
    def off(i: Int, cols: String*)(df: DataFrame): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * Off)))

    // fixed-cardinality dimensions copy verbatim
    write("region", read("region"))
    write("nation", read("nation"))
    rep("customer")((df, i) => off(i, "c_custkey")(df))
    rep("supplier")((df, i) => off(i, "s_suppkey")(df))
    rep("part")((df, i) => off(i, "p_partkey")(df))
    rep("orders")((df, i) => off(i, "o_orderkey", "o_custkey")(df))
    rep("lineitem")((df, i) => off(i, "l_orderkey", "l_partkey", "l_suppkey")(df))
    rep("events")((df, i) => off(i, "event_id", "user_id")(df))
    rep("documents") { (df, i) =>
      val d = off(i, "doc_id")(df)
      if (i == 0) d
      else d.withColumn("text",
        // deterministic per-replica word shuffle: same tokens, different
        // shingles — replicas are corpus growth, not near-duplicates
        concat_ws(" ", transform(
          array_sort(zip_with(
            split(col("text"), " "),
            sequence(lit(0), size(split(col("text"), " ")) - 1),
            (w, p) => struct(xxhash64(w, p, lit(i)).as("k"), w.as("w")))),
          s => s.getField("w"))))
    }
    rep("embeddings") { (df, i) =>
      val d = off(i, "vec_id")(df)
      if (i == 0) d
      else d.withColumn("embedding",
        zip_with(col("embedding"),
          sequence(lit(0), size(col("embedding")) - 1),
          (x, p) => (x + (pmod(xxhash64(col("vec_id"), p, lit(i)), lit(1000))
            .cast("double") - 500.0) / 50000.0).cast("float")))
    }
    spark.stop()
  }
}

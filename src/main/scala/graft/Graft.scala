package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing entry points: session construction with the engine's
  * extensions installed, and SQL-surface registration so every table and
  * graph is queryable from `spark.sql(...)`.
  */
object Graft {
  /** A SparkSession wired for the engine: extensions (fnv64/vec_dot),
    * AQE, UTC, and sane local shuffle parallelism. */
  def session(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()

  /** Register every testdata table under its name as a temp view, so the
    * whole relational surface is available to plain SQL. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(t => Tables.table(spark, dir, t).createOrReplaceTempView(t))
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }

  /** Register a BVGraph (plain or sharded) as a temp view of
    * (id, successors, outdegree). */
  def registerGraph(spark: SparkSession, name: String, basename: String): DataFrame = {
    val df = spark.read.format("bvgraph").option("basename", basename).load()
    df.createOrReplaceTempView(name)
    df
  }
}

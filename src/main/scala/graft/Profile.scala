package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling harness: run the named queries in ONE warm session
  * (bench-identical config), print per-run wall seconds and, with
  * -Dgraft.explain=1, the AQE-final formatted plan. Iteration tool only —
  * the driver contract mains are Verify/Bench.
  *
  * Usage: Profile <sfDir> <query>[,query...] [runs]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup (JIT/codegen/parquet init), same as Bench
    SparkEntry.queries("scalar_funcs")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    // sub-plan probes for decomposition (not part of the query surface)
    val extras: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      Map("_copurchase" -> ((s, d) => queries.GraphAlgos.coPurchaseEdges(s, d)))
    names.foreach { name =>
      (1 to runs).foreach { i =>
        // -Dgraft.sweep=1 replicates Bench's cold-cache discipline (hard
        // sweep before every timed run) instead of warm-session timing
        if (sys.props.get("graft.sweep").contains("1")) Caches.hardSweep(spark)
        val t0 = System.nanoTime()
        val df = SparkEntry.queries.getOrElse(name, extras(name))(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[profile] $name run$i: $sec%.2f s")
        if (i == runs && sys.props.get("graft.explain").contains("1")) {
          df.collect() // settle AQE on the same QueryExecution
          println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        }
      }
    }
    spark.stop()
  }
}

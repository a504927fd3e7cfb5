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
    // -Dgraft.jobs=1: per-JOB timing (id, wall ms, #stages, #tasks,
    // description) — decomposes barrier-bound iterative queries into
    // their actions/broadcast-collect jobs, which per-query wall time
    // cannot separate
    if (sys.props.get("graft.jobs").contains("1"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val starts =
            new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int, String)]()
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts.put(js.jobId, (System.nanoTime(), js.stageInfos.map(_.numTasks).sum,
              Option(js.properties).flatMap(p =>
                Option(p.getProperty("spark.job.description"))).getOrElse(""))): Unit
          override def onJobEnd(
              je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val st = starts.remove(je.jobId)
            if (st != null) println(
              f"[job] id=${je.jobId}%4d ms=${(System.nanoTime() - st._1) / 1e6}%7.1f " +
                f"tasks=${st._2}%4d ${st._3.take(90)}")
          }
        })
    // warmup (JIT/codegen/parquet init), same as Bench
    SparkEntry.queries("scalar_funcs")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    // sub-plan probes for decomposition (not part of the query surface)
    val extras: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      Map("_copurchase" -> ((s, d) => queries.GraphAlgos.coPurchaseEdges(s, d)),
        // architectural floor of one iteration round: lazy localCheckpoint
        // of a trivially-transformed 20k-row frame + 1-row agg action,
        // 20 rounds — isolates the per-barrier cost every iterative query
        // pays from any real operator work
        "_roundfloor" -> ((s, _) => {
          import org.apache.spark.sql.functions._
          var df = s.range(20000).select(col("id").as("x"), col("id").as("h"))
          var ids = Set.empty[Int]
          for (r <- 1 to 20) {
            val t0 = System.nanoTime()
            val (ck, nIds) = queries.GraphAlgos.checkpointWithIdsLazy(
              df.select(col("x"), (col("h") + r).as("h")))
            val st = ck.agg(sum(col("h"))).head()
            require(!st.isNullAt(0))
            queries.GraphAlgos.freeRdds(s, ids)
            df = ck; ids = nIds
            println(f"[floor] round $r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
          }
          df
        }),
        // the streaming replay harness's own cost (see Bench's
        // stream_harness_floor) — profiled here so -Dgraft.jobs=1 can
        // decompose it into staging writes vs micro-batch commits
        "_streamfloor" -> ((s, d) =>
          graft.streaming.StreamingOps.harnessFloor(s, d)))
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

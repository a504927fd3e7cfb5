package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named declared queries into files —
  * the per-query plan evidence the optimization rounds commit under
  * `plans/rNN/<query>_<suffix>.txt`. The query is EXECUTED first (noop
  * consumption of every row through the final physical plan) so AQE
  * settles and the dumped plan is the final one (`isFinalPlan=true`),
  * with the bench's session shape (shuffle partitions = cpus, AQE on).
  *
  * Run: java -cp "target/scala-2.13/classes:<spark jars>" graft.PlanDump \
  *   <sfDir> <outDir> <suffix> <query> [query ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <sfDir> <outDir> <suffix> <query> [query ...]")
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val names = args.drop(3).toSeq
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
      .config("spark.local.dir", Scratch.dir("spark_local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      Caches.hardSweep(spark)
      val df = SparkEntry.queries(name)(spark, sfDir)
      // consume every row through the final plan (noop-sink equivalent
      // on the SAME QueryExecution, so the explain below is AQE-final)
      df.queryExecution.toRdd.foreachPartition { it =>
        while (it.hasNext) { it.next(); () }
      }
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every declared query at SPARK_GRAFT_SF_DIR, one
  * JSON line on stdout. The noop sink executes the COMPLETE physical plan
  * (count() would let Catalyst elide sorts/projections).
  *
  * Each query runs SPARK_GRAFT_RUNS times (default 3) with a FULL cache
  * reset before every run ([[Caches.hardSweep]]): per-query numbers are
  * order-independent medians, not whatever the session accumulated —
  * round 3 measured 3–66x regressions on unchanged queries purely from
  * leaked caches, and single-run totals on this box swing ±50% on GC
  * spikes. Reported: median per query (and the max across runs in
  * `queries_max`), total = sum of medians. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
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
    // untimed warmup: JIT + codegen + parquet reader init so the first
    // timed query doesn't absorb JVM start-up costs
    SparkEntry.queries("scalar_funcs")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    def fmt(v: Double): String = f"$v%.3f"
    // a failed query reports -1 (never its partial elapsed time, which
    // would read as a speedup) and is excluded from the total
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to runs).flatMap { _ =>
        Caches.hardSweep(spark) // order-independent: no inherited caches
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            None
        }
      }
      if (times.isEmpty) (name, -1.0, -1.0)
      else {
        val sorted = times.sorted
        (name, sorted(sorted.length / 2), sorted.last)
      }
    }
    val qs = results.map { case (k, med, _) => "\"" + k + "\":" + fmt(med) }
      .mkString("{", ",", "}")
    val qsMax = results.map { case (k, _, mx) => "\"" + k + "\":" + fmt(mx) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, med, _) if med < 0 => "\"" + k + "\"" }
    val total = results.map(_._2).filter(_ >= 0).sum
    // stdout gets the SHORT line (medians only): the round-4 harness
    // truncated the long line mid-JSON and recovered nothing. The full
    // record (incl. per-query maxes) goes to a repo file so the numbers
    // stay auditable regardless of the driver's capture window.
    val shortLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,""" +
        s""""runs":$runs,"errors":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}"""
    val fullLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,""" +
        s""""queries_max":$qsMax,"runs":$runs,""" +
        s""""errors":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}"""
    println(shortLine)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.md")
    try {
      val md = s"# BENCH\n\nFull bench record (medians of $runs runs with " +
        s"hard cache sweeps; `queries_max` = worst run).\n\n```json\n$fullLine\n```\n"
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        md.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}

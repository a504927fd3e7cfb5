package graft
// TEMPORARY probe (deleted before commit)
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ClampProbe {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    val b2 = if (args.contains("ext"))
      b.config("spark.sql.extensions", "graft.GraftExtensions") else b
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sc = spark.sparkContext
    def ckpt(df: org.apache.spark.sql.DataFrame) = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val out = org.apache.spark.sql.graftbridge.Checkpoints.clampStats(
        df.localCheckpoint(true))
      (out, sc.getPersistentRDDs.keySet.toSet.diff(before))
    }
    var (df, ids) = ckpt(Seq(1L, 2L, 3L).toDF("x"))
    for (i <- 1 to 60) {
      val (nd, nids) = ckpt(
        df.join(df.withColumnRenamed("x", "y"), expr("x = y"))
          .join(df.withColumnRenamed("x", "z"), expr("x = z"))
          .select(col("x")))
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
      df = nd; ids = nids
      // like the spec: NO action inside the loop beyond the eager ckpt
      assert(df.queryExecution.analyzed.stats.sizeInBytes <= BigInt(10).pow(18))
    }
    println("done rows=" + df.count())
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Table loaders for the driver-generated parquet testdata
  * (see /root/repo/TESTDATA.md). All queries take the scale-factor
  * directory as a parameter so the same code runs at any SF — and on a
  * real cluster the path would simply be an HDFS/S3 prefix; the parquet
  * reader splits, prunes and pushes down identically.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** events.ts has shipped in two parquet vintages, normalized here so
    * every consumer sees one shape — an instant-typed `TimestampType`
    * column under the UTC sessions all entry points build:
    *
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it outright;
    *    with `spark.sql.legacy.parquet.nanosAsLong=true` (set by
    *    Verify/Bench/test builders) it arrives as a raw-nanos Long and is
    *    converted with integer arithmetic (a double division would lose
    *    precision at 1.7e18 ns).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 reads it as
    *    TIMESTAMP_NTZ; cast to TimestampType. The session timezone is
    *    UTC, so the wall-clock digits ARE the instant — identical to
    *    what DuckDB's naive read + `epoch_us()` produces on the oracle
    *    side, and identical to the nanos vintage's semantics.
    *
    * This loader is side-effect-free — it must not flip a session-global
    * conf that changes how every later parquet read in a shared session
    * decodes TIMESTAMP(NANOS) columns.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

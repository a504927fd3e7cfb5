package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.IntersectCount

/** Gates for the IntersectCountRewrite optimizer rule: exact
  * size(array_intersect) semantics (differential against a Scala model
  * over adversarial arrays), rewrite fires for eligible types, does NOT
  * fire for floating element types, and the triangle count actually
  * executes through it. */
class IntersectCountSpec extends AnyFunSuite {
  import SparkSessionFixture._

  private def model(a: Seq[Any], b: Seq[Any]): Int = {
    // distinct elements of a present in b; shared null counts once
    val bSet = b.filter(_ != null).toSet
    val bNull = b.contains(null)
    val aDistinct = a.distinct
    aDistinct.count(x => if (x == null) bNull else bSet.contains(x))
  }

  test("unit: count == size(array_intersect) model on adversarial arrays") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.LongType
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200) {
      val a = Seq.fill(rnd.nextInt(12))(
        if (rnd.nextInt(8) == 0) null else java.lang.Long.valueOf(rnd.nextInt(6).toLong))
      val b = Seq.fill(rnd.nextInt(12))(
        if (rnd.nextInt(8) == 0) null else java.lang.Long.valueOf(rnd.nextInt(6).toLong))
      val got = IntersectCount.count(
        new GenericArrayData(a.toArray[Any]), new GenericArrayData(b.toArray[Any]), LongType)
      assert(got == model(a, b), s"a=$a b=$b")
    }
  }

  // local-relation inputs get fully constant-folded (ConvertToLocalRelation
  // evaluates the projection at optimize time), hiding the plan shape —
  // exclude that rule so the rewrite stays observable
  private def withoutLocalFold[T](body: => T): T = {
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    try body finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("rewrite fires end-to-end and values match the unrewritten result") {
    withoutLocalFold {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(300)((
      Seq.fill(rnd.nextInt(10))(rnd.nextInt(7).toLong),
      Seq.fill(rnd.nextInt(10))(rnd.nextInt(7).toLong)))
    val df = rows.toDF("a", "b")
      .select(col("a"), col("b"), size(array_intersect(col("a"), col("b"))).as("n"))
    // the optimizer must have swapped in the native expression
    assert(df.queryExecution.optimizedPlan.toString.contains("intersect_count"),
      df.queryExecution.optimizedPlan.toString)
    df.collect().foreach { r =>
      val exp = model(r.getSeq[Long](0), r.getSeq[Long](1))
      assert(r.getInt(2) == exp, s"row $r expected $exp")
    }
    }
  }

  test("strings rewrite too; double arrays do NOT (NaN/-0.0 edges)") {
    withoutLocalFold {
    import spark.implicits._
    val sdf = Seq((Seq("x", "y", "x"), Seq("x", "z"))).toDF("a", "b")
      .select(size(array_intersect(col("a"), col("b"))).as("n"))
    assert(sdf.queryExecution.optimizedPlan.toString.contains("intersect_count"))
    assert(sdf.collect().head.getInt(0) == 1)
    val ddf = Seq((Seq(1.0, 2.0), Seq(2.0))).toDF("a", "b")
      .select(size(array_intersect(col("a"), col("b"))).as("n"))
    assert(!ddf.queryExecution.optimizedPlan.toString.contains("intersect_count"))
    assert(ddf.collect().head.getInt(0) == 1)
    }
  }

  test("graph_triangles executes through intersect_count") {
    val df = SparkEntry.queries("graph_triangles")(spark, sf0001)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("intersect_count"),
      "triangle closing test did not use the native counter")
  }
}

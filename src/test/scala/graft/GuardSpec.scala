package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.GraphAlgos.requirePackedIds

/** Fail-loud guards for silent-corruption paths: the BIGINT packed-key
  * call-sites (graph_msf's pk, graph_mis's prio, graph_random_walk's
  * argmin key — a silently mis-sorted packing is "wrong result, right
  * cardinality", the worst failure mode) and PqEncode's arity check (an
  * undersized vector would read raw memory past the array on
  * UnsafeArrayData). bv_big makes >2³¹ id spaces reachable, so these are
  * live paths, not hypotheticals. */
class GuardSpec extends AnyFunSuite {
  import SparkSessionFixture._

  test("requirePackedIds passes in-range frames and names the offending column") {
    import spark.implicits._
    val ok = Seq((100L, 200L, 300L)).toDF("u", "v", "w")
    requirePackedIds("test", ok,
      "u" -> (1L << 22), "v" -> (1L << 22), "w" -> (1L << 19))
    val bad = Seq((100L, (1L << 22) + 7L, 300L)).toDF("u", "v", "w")
    val e = intercept[IllegalArgumentException] {
      requirePackedIds("test", bad,
        "u" -> (1L << 22), "v" -> (1L << 22), "w" -> (1L << 19))
    }
    assert(e.getMessage.contains("max(v)") && e.getMessage.contains("widen"))
  }

  test("graph_msf pk bound: w >= 2^19 fails loudly") {
    import spark.implicits._
    val bad = Seq((1L, 2L, (1L << 19) + 1L)).toDF("u", "v", "w")
    val e = intercept[IllegalArgumentException] {
      requirePackedIds("graph_msf pk", bad,
        "u" -> (1L << 22), "v" -> (1L << 22), "w" -> (1L << 19))
    }
    assert(e.getMessage.contains("graph_msf"))
  }

  test("graph_mis prio bound: id >= 2^22 fails loudly") {
    import spark.implicits._
    val bad = Seq(((1L << 22) + 3L, 2L)).toDF("u", "v")
    val e = intercept[IllegalArgumentException] {
      requirePackedIds("graph_mis prio", bad,
        "u" -> (1L << 22), "v" -> (1L << 22))
    }
    assert(e.getMessage.contains("graph_mis"))
  }

  test("graph_random_walk argmin bound: id >= 1e9 fails loudly") {
    import spark.implicits._
    val bad = Seq((1000000001L, 2L)).toDF("u", "v")
    val e = intercept[IllegalArgumentException] {
      requirePackedIds("graph_random_walk argmin key", bad,
        "u" -> 1000000000L, "v" -> 1000000000L)
    }
    assert(e.getMessage.contains("random_walk"))
  }

  test("pq_encode rejects undersized vectors in both eval paths") {
    import org.apache.spark.sql.graftbridge.Exprs
    import spark.implicits._
    // m=2 subspaces x subDim=2 => needs 4 elements; feed 3
    val cb: Seq[Seq[(Long, Seq[Long])]] =
      Seq(Seq((0L, Seq(1L, 1L)), (1L, Seq(5L, 5L))),
        Seq((0L, Seq(2L, 2L)), (1L, Seq(9L, 9L))))
    def encoded(codegen: String) = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try Seq(Seq(1L, 2L, 3L)).toDF("vec")
        .select(Exprs.toColumn(graft.functions.PqEncode(
          Exprs.toExpr(col("vec")), cb, 2)).as("codes"))
        .collect()
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      val e = intercept[Exception] { encoded(mode) }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(msgs.contains("pq_encode"), s"mode=$mode: $msgs")
    }
    // and a correctly-sized vector still encodes
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val good = Seq(Seq(1L, 1L, 9L, 9L)).toDF("vec")
        .select(Exprs.toColumn(graft.functions.PqEncode(
          Exprs.toExpr(col("vec")), cb, 2)).as("codes"))
        .head().getSeq[Long](0)
      assert(good == Seq(0L, 1L))
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }
}

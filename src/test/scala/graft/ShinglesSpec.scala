package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Exprs
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Shingles

/** Differential gate for the native [[graft.functions.Shingles]]
  * expression: it must reproduce the SQL HOF pipeline
  * (split/regexp_replace/transform/concat_ws/array_distinct) ELEMENT FOR
  * ELEMENT — on crafted whitespace/case/degenerate edges and on every
  * real document at two SFs — because the DuckDB oracles still express
  * that SQL pipeline.
  */
class ShinglesSpec extends AnyFunSuite {
  import SparkSessionFixture._

  // the original SQL pipeline, kept HERE as the differential reference
  private def sqlNorm(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")
  private def sqlShingles(c: Column, distinct: Boolean): Column =
    element_at(transform(array(split(sqlNorm(c), " ")), t =>
      when(size(t) >= 3, {
        val grams = transform(sequence(lit(0), size(t) - 3),
          i => concat_ws(" ",
            element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3)))
        if (distinct) array_distinct(grams) else grams
      }).otherwise(array(array_join(t, " ")))), 1)

  private def native(c: Column, distinct: Boolean): Column =
    Exprs.toColumn(Shingles(Exprs.toExpr(c), 3, distinct))

  private def diff(df: org.apache.spark.sql.DataFrame, textCol: String): Unit = {
    for (distinct <- Seq(true, false)) {
      val rows = df.select(
        sqlShingles(col(textCol), distinct).as("sql"),
        native(col(textCol), distinct).as("nat"),
        col(textCol)).collect()
      rows.foreach { r =>
        val (s, n) = (r.getSeq[String](0), r.getSeq[String](1))
        assert(s == n,
          s"distinct=$distinct text=${r.getString(2).take(60)}…\nsql=$s\nnat=$n")
      }
    }
  }

  test("native shingles == SQL pipeline on whitespace/case/degenerate edges") {
    import spark.implicits._
    val crafted = Seq(
      "", " ", "   ", "a", "a b", "a b c", "a b c d",
      "  leading and trailing  ", "\tleading tab x y", "trailing nl a b\n",
      "UPPER Case MiXeD words here", "a\t\tb\n\nc\rd\fe",
      "a b c a b c a b c",          // repeated shingles (distinct path)
      "multi   space   runs collapse", "onevertical tab here",
      "word " * 200)                 // long doc
      .toDF("text")
    diff(crafted, "text")
  }

  test("native shingles == SQL pipeline on the real corpus (two SFs)") {
    diff(Tables.documents(spark, sf0001), "text")
    diff(Tables.documents(spark, sf001), "text")
  }

  test("shingles registers as a SQL function via GraftExtensions") {
    val got = spark.sql(
      "SELECT shingles('A  quick\tbrown fox', 3, true) AS sh")
      .collect().head.getSeq[String](0)
    assert(got == Seq("a quick brown", "quick brown fox"))
  }

  test("shingles SQL builder rejects non-constant / mistyped args clearly") {
    import org.apache.spark.sql.AnalysisException
    // non-constant n (a column reference)
    val e1 = intercept[AnalysisException] {
      spark.sql("SELECT shingles('x', id, true) FROM range(1)").collect()
    }
    assert(e1.getMessage.contains("constant INT"))
    // LONG-typed constant (would have ClassCastException'd before)
    val e2 = intercept[AnalysisException] {
      spark.sql("SELECT shingles('x', CAST(3 AS BIGINT), true)").collect()
    }
    assert(e2.getMessage.contains("constant INT"))
    // NULL distinct (would have NPE'd before)
    val e3 = intercept[AnalysisException] {
      spark.sql("SELECT shingles('x', 3, CAST(NULL AS BOOLEAN))").collect()
    }
    assert(e3.getMessage.contains("must not be NULL"))
    // wrong arity
    val e4 = intercept[AnalysisException] {
      spark.sql("SELECT shingles('x', 3)").collect()
    }
    assert(e4.getMessage.contains("3 arguments"))
  }

  test("shingles SQL builder accepts foldable constant expressions") {
    // 1+2 and CAST(… AS INT) are constants but NOT bare literals at
    // resolution time (folding runs later in the optimizer)
    val got = spark.sql(
      "SELECT shingles('a b c d', 1 + 2, CAST('true' AS BOOLEAN)) AS sh")
      .collect().head.getSeq[String](0)
    assert(got == Seq("a b c", "b c d"))
  }
}

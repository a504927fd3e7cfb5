package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WindowHashes
import org.apache.spark.sql.graftbridge.Exprs

/** [[graft.functions.WindowHashes]] — the O(n) rolling-hash twin of the
  * xxhash64(substr) window walk behind dedup_substring_spans. The
  * downstream contract is HASH-EQUALITY == WINDOW-EQUALITY, so the spec
  * checks both directions against the actual substrings on the real
  * corpus (equal windows must collide; distinct windows must not — the
  * second direction is the birthday-odds one, deterministic here and a
  * regression canary against e.g. an even base or a broken roll). */
class WindowHashesSpec extends AnyFunSuite {
  import SparkSessionFixture._
  private val W = 40

  private def winCol = Exprs.toColumn(
    WindowHashes(Exprs.toExpr(col("text")), W))

  test("hash classes equal substring classes on the sf0.001 corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(length(col("text")) >= W)
    val both = docs.select(col("doc_id"), col("text"),
        posexplode(winCol).as(Seq("pos", "h")))
      .select(col("doc_id"), col("h"),
        expr(s"substr(text, pos + 1, $W)").as("win"))
    // same substring -> same hash (roll correctness), and same hash ->
    // same substring (no collisions on this corpus)
    assert(both.groupBy(col("win")).agg(countDistinct(col("h")).as("n"))
      .filter(col("n") =!= 1).count() == 0, "equal windows hashed apart")
    assert(both.groupBy(col("h")).agg(countDistinct(col("win")).as("n"))
      .filter(col("n") =!= 1).count() == 0, "hash collision across windows")
    // count matches the substr/sequence law: len - W + 1 windows per doc
    val counts = docs.select(col("doc_id"),
        (length(col("text")) - (W - 1)).cast("long").as("want"),
        size(winCol).cast("long").as("got"))
      .filter(col("want") =!= col("got")).count()
    assert(counts == 0, "window count mismatch vs length - W + 1")
  }

  test("window_hashes registers as a SQL function via GraftExtensions") {
    import spark.implicits._
    Seq("x" * 45).toDF("text").createOrReplaceTempView("wh_sql_probe")
    val viaSql = spark.sql(
      s"SELECT size(window_hashes(text, $W)) AS n FROM wh_sql_probe")
      .head().getInt(0)
    assert(viaSql == 6, s"45-char text must yield 6 windows, got $viaSql")
    // constant-argument discipline: a column as w is an analysis error
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT window_hashes(text, length(text)) FROM wh_sql_probe")
        .collect()
    }
    assert(err.getMessage.contains("constant INT"), err.getMessage)
  }

  test("edge cases: short strings, exact-W, and the non-ASCII path") {
    import spark.implicits._
    val rows = Seq(
      ("a" * 39, 0),          // shorter than W -> empty
      ("b" * 40, 1),          // exactly W -> one window
      ("señor " * 20, -1),    // non-ASCII path (ñ is 2 UTF-8 bytes)
      ("日本語テキスト" * 10, -1)  // 3-byte code points
    ).toDF("text", "want")
    val got = rows.select(col("text"), col("want"),
      size(winCol).as("got"),
      (length(col("text")) - (W - 1)).as("law"))
    got.collect().foreach { r =>
      val want = if (r.getInt(1) >= 0) r.getInt(1)
        else math.max(0, r.getInt(3))
      assert(r.getInt(2) == want,
        s"window count for ${r.getString(0).take(10)}...: " +
          s"got ${r.getInt(2)}, want $want")
    }
    // the non-ASCII path must agree with substring equality too: repeat
    // of a 6-char unit => window starts 6 apart within one doc collide
    val nonAscii = Seq(("señor " * 20)).toDF("text")
    val pairs = nonAscii.select(posexplode(winCol).as(Seq("pos", "h")))
    val perHash = pairs.groupBy(col("h")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(perHash > 1, "periodic non-ASCII text must produce repeat hashes")
  }
}

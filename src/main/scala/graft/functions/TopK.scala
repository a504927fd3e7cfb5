package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bounded top-k per group as a typed `Aggregator`: the buffer is a
  * flattened, sorted `[sortVal0, id0, sortVal1, id1, …]` array capped at
  * k pairs, ordered by (sortVal DESC, id ASC).
  *
  * Why this exists next to the window-function top-k (`win_rank_topk`):
  * `rank() OVER (PARTITION BY g ORDER BY v) <= k` shuffles EVERY row of
  * every group and sorts each partition before discarding all but k rows.
  * An Aggregator gets Spark's partial-aggregation machinery: each map
  * task reduces its rows to ≤ k pairs per group BEFORE the exchange, so
  * the shuffle carries O(groups × k) pairs instead of O(rows) — at
  * 100 TB that is the difference between shuffling the fact table and
  * shuffling a summary. Merge is an order-preserving two-pointer merge,
  * associative and commutative.
  */
object TopK {

  final class TopKPairs(k: Int) extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    require(k > 0)

    @inline private def better(c1: Long, i1: Long, c2: Long, i2: Long): Boolean =
      c1 > c2 || (c1 == c2 && i1 < i2)

    override def zero: Array[Long] = Array.empty[Long]

    override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
      val (c, id) = in
      val n = buf.length / 2
      // full buffer and the new pair loses to the current last → no-op
      if (n == k && !better(c, id, buf(2 * (k - 1)), buf(2 * k - 1))) return buf
      val m = math.min(n + 1, k)
      val out = new Array[Long](m * 2)
      var i = 0; var j = 0; var placed = false
      while (j < m) {
        val takeNew = !placed && (i >= n || better(c, id, buf(2 * i), buf(2 * i + 1)))
        if (takeNew) { out(2 * j) = c; out(2 * j + 1) = id; placed = true }
        else { out(2 * j) = buf(2 * i); out(2 * j + 1) = buf(2 * i + 1); i += 1 }
        j += 1
      }
      out
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val na = a.length / 2; val nb = b.length / 2
      val m = math.min(na + nb, k)
      val out = new Array[Long](m * 2)
      var i = 0; var j = 0; var o = 0
      while (o < m) {
        val takeA = j >= nb ||
          (i < na && better(a(2 * i), a(2 * i + 1), b(2 * j), b(2 * j + 1)))
        if (takeA) { out(2 * o) = a(2 * i); out(2 * o + 1) = a(2 * i + 1); i += 1 }
        else { out(2 * o) = b(2 * j); out(2 * o + 1) = b(2 * j + 1); j += 1 }
        o += 1
      }
      out
    }

    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }
}

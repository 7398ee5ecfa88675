package graft.ops

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}

import scala.collection.mutable

/** Sketch aggregations — the custom-`Aggregator` tier of the operator
  * ladder (SURVEY §7.3 "Extension aggregates"), for metrics where exact
  * computation shuffles too much state at 100 TB.
  *
  * Space-saving top-k: bounded-memory heavy hitters. Each partition
  * keeps at most `capacity` counters (Metwally et al.'s space-saving,
  * public algorithm); merge sums counters and re-prunes. With capacity ≫
  * k the frequent items' counts are exact (standard guarantee: error ≤
  * N/capacity), so well-separated heavy hitters come out identical to an
  * exact groupBy count — at a fraction of the shuffle (capacity rows per
  * partition instead of one per distinct key).
  */
object Sketches {

  final case class TopK(items: Seq[(String, Long)])

  final class SpaceSavingTopK(capacity: Int, k: Int)
      extends Aggregator[String, mutable.Map[String, Long], Seq[(String, Long)]] {

    def zero: mutable.Map[String, Long] = mutable.Map.empty

    def reduce(buf: mutable.Map[String, Long], item: String): mutable.Map[String, Long] = {
      if (buf.contains(item) || buf.size < capacity) {
        buf(item) = buf.getOrElse(item, 0L) + 1
      } else {
        // evict the minimum counter, inherit its count (space-saving)
        val (minK, minV) = buf.minBy(_._2)
        buf.remove(minK)
        buf(item) = minV + 1
      }
      buf
    }

    def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
      b.foreach { case (k2, v) => a(k2) = a.getOrElse(k2, 0L) + v }
      if (a.size > capacity) {
        val keep = a.toSeq.sortBy { case (key, v) => (-v, key) }.take(capacity)
        a.clear(); keep.foreach { case (key, v) => a(key) = v }
      }
      a
    }

    def finish(buf: mutable.Map[String, Long]): Seq[(String, Long)] =
      buf.toSeq.sortBy { case (key, v) => (-v, key) }.take(k)

    def bufferEncoder: Encoder[mutable.Map[String, Long]] =
      Encoders.kryo[mutable.Map[String, Long]]
    def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Untyped-DataFrame form: `df.agg(topKUdaf(256, 10)(col("word")))`. */
  def topKUdaf(capacity: Int, k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new SpaceSavingTopK(capacity, k))

  /** Count-min sketch (Cormode & Muthukrishnan, public algorithm):
    * fixed `depth`×`width` counter grid, point estimate = min over rows.
    * The merge is element-wise addition — fully commutative/associative,
    * so unlike HLL register states the estimate is identical under any
    * partitioning (deterministic cross-run). Guarantee: estimate ≥ exact,
    * and ≤ exact + εN with probability 1−δ where ε = e/width, δ = e^−depth.
    *
    * Shuffle shape at 100 TB: one partial aggregate per partition (a
    * fixed depth·width·8-byte buffer), one merge — counter traffic is
    * O(partitions), never O(distinct keys); the whole point of the
    * sketch tier vs an exact groupBy.
    *
    * `queryItems` (bounded, driver-supplied) is the point-query set the
    * `finish` evaluates — the sketch itself never leaves the executors.
    * Row hashes are Kirsch–Mitzenmacher double hashing over the same
    * FNV-1a-64 the engine already replays in SQL elsewhere.
    */
  final class CountMin(depth: Int, width: Int, queryItems: Seq[String])
      extends Aggregator[String, Array[Long], Seq[(String, Long)]] {

    // Kirsch–Mitzenmacher: hash the item ONCE, derive every row's bucket
    // from (h, h2) — re-hashing per row would walk the string depth times
    private def bucket(h: Long, row: Int): Int = {
      val h2 = java.lang.Long.rotateLeft(h, 31) | 1L // odd => full-period step
      val idx = (h + row.toLong * h2) % width
      (if (idx < 0) idx + width else idx).toInt
    }

    def zero: Array[Long] = new Array[Long](depth * width)

    def reduce(buf: Array[Long], item: String): Array[Long] = {
      val h = Dedup.fnv1a64(item)
      var r = 0
      while (r < depth) { buf(r * width + bucket(h, r)) += 1; r += 1 }
      buf
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    def finish(buf: Array[Long]): Seq[(String, Long)] =
      queryItems.map { item =>
        val h = Dedup.fnv1a64(item)
        var est = Long.MaxValue
        var r = 0
        while (r < depth) {
          est = math.min(est, buf(r * width + bucket(h, r))); r += 1
        }
        item -> est
      }

    def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Untyped-DataFrame form of [[CountMin]]. */
  def countMinUdaf(depth: Int, width: Int, queryItems: Seq[String])
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new CountMin(depth, width, queryItems))
}

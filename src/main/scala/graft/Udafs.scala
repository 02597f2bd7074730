package graft

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.11): the two custom aggregates the
  * design calls for, both built on the public `Aggregator` API (standard,
  * codegen-integrated — not raw `TypedImperativeAggregate`).
  *
  *  - [[TopKByScore]]: bounded per-partition top-k heap — the scale-out
  *    form of "ORDER BY score LIMIT k" that never materializes a global
  *    sort (each partition keeps ≤ k rows, merge is k+k → k). This is the
  *    100 TB path for similarity search (L4): score 10¹¹ rows, shuffle
  *    only #partitions × k candidates.
  *  - [[VectorCentroid]]: per-group mean of float vectors (dim-wise sum +
  *    count) — the building block for IVF-style ANN partitioning.
  */
object Udafs {

  /** Top-k (score desc, id asc tie-break) as a typed aggregate.
    * Input (id, score); output the sorted top-k list.
    */
  class TopKByScore(k: Int)
      extends Aggregator[(Long, Double), Seq[(Long, Double)],
                         Seq[(Long, Double)]] {
    private val ord: Ordering[(Long, Double)] =
      Ordering.by[(Long, Double), (Double, Long)](t => (-t._2, t._1))

    override def zero: Seq[(Long, Double)] = Nil
    override def reduce(b: Seq[(Long, Double)],
                        a: (Long, Double)): Seq[(Long, Double)] =
      // fast path: buffer full and the new row is no better than the
      // current worst — O(1) discard, no allocation (the common case once
      // the heap is warm; the full re-sort only runs on an actual insert)
      if (b.length >= k && ord.gteq(a, b.last)) b
      else (a +: b).sorted(ord).take(k)
    override def merge(b1: Seq[(Long, Double)],
                       b2: Seq[(Long, Double)]): Seq[(Long, Double)] =
      (b1 ++ b2).sorted(ord).take(k)
    override def finish(b: Seq[(Long, Double)]): Seq[(Long, Double)] = b
    override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
      ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Long, Double)]] =
      ExpressionEncoder()
  }

  /** Dim-wise mean of DOUBLE vectors with the dimension discovered from
    * the first row (buffer starts empty and sizes itself) — the PQ
    * sub-vector centroid, where the sub-dimension is dim/m and not known
    * at call-site construction time. Same (sums, count) mergeable state
    * as [[VectorCentroid]].
    */
  class VectorCentroidAny
      extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {
    override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)
    override def reduce(b: (Array[Double], Long),
                        v: Seq[Double]): (Array[Double], Long) = {
      val s = if (b._1.isEmpty) new Array[Double](v.length) else b._1
      var i = 0
      while (i < s.length && i < v.length) { s(i) += v(i); i += 1 }
      (s, b._2 + 1)
    }
    override def merge(b1: (Array[Double], Long),
                       b2: (Array[Double], Long)): (Array[Double], Long) = {
      if (b1._1.isEmpty) (b2._1, b1._2 + b2._2)
      else if (b2._1.isEmpty) (b1._1, b1._2 + b2._2)
      else {
        val (s1, s2) = (b1._1, b2._1)
        var i = 0
        while (i < s1.length && i < s2.length) { s1(i) += s2(i); i += 1 }
        (s1, b1._2 + b2._2)
      }
    }
    override def finish(b: (Array[Double], Long)): Seq[Double] =
      if (b._2 == 0) Seq.empty else b._1.map(_ / b._2).toSeq
    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      Encoders.tuple(ExpressionEncoder[Array[Double]](),
                     Encoders.scalaLong)
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }

  /** Dim-wise mean of float vectors. Input the vector; buffer (sums,
    * count); output the centroid as doubles.
    */
  class VectorCentroid(dim: Int)
      extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {
    override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)
    override def reduce(b: (Array[Double], Long),
                        v: Seq[Float]): (Array[Double], Long) = {
      val (s, n) = b
      var i = 0
      while (i < dim && i < v.length) { s(i) += v(i); i += 1 }
      (s, n + 1)
    }
    override def merge(b1: (Array[Double], Long),
                       b2: (Array[Double], Long)): (Array[Double], Long) = {
      val (s1, n1) = b1
      val (s2, n2) = b2
      var i = 0
      while (i < dim) { s1(i) += s2(i); i += 1 }
      (s1, n1 + n2)
    }
    override def finish(b: (Array[Double], Long)): Seq[Double] = {
      val (s, n) = b
      if (n == 0) Seq.fill(dim)(0.0) else s.map(_ / n).toSeq
    }
    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      Encoders.tuple(ExpressionEncoder[Array[Double]](),
                     Encoders.scalaLong)
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded KMV (k-minimum-values) distinct sketch — the set-operation
  * sketch family (Beyer et al., SIGMOD 2007; the theta sketch of
  * Dasgupta et al. is its streaming generalization). State is the k
  * SMALLEST DISTINCT hash values seen, kept sorted ascending — a
  * semilattice under merge (associative, commutative, idempotent), so
  * partial aggregation runs map-side and only ≤ k longs per group per
  * partition cross the shuffle, regardless of corpus cardinality.
  *
  * Distinct estimate: with uniform h over [0, M), the k-th smallest
  * value θ satisfies E[θ/M] ≈ k/(n+1), giving n̂ = (k−1)·M/θ (the
  * unbiased KMV estimator). Set operations between two sketches use
  * θ = min(θ_A, θ_B): every kept hash below θ is a uniform θ/M-rate
  * sample of the underlying set, so |A∪B|, |A∩B|, |A∖B| estimate as
  * (sample-op size)·M/θ — the whole point at 100 TB, where corpus
  * overlap is answered from two k-long arrays instead of a
  * corpus × corpus join.
  *
  * Engine-portable by the same discipline as the HLL/CMS family: values
  * are hashed with the deterministic 60-bit md5 construction
  * ([[Text.hash64]]), so an oracle on ANY engine rebuilds the identical
  * sketch (k smallest distinct md5 prefixes) and the identical
  * estimates — no vendor sketch internals involved.
  */
final class KmvAgg(k: Int)
  extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 2, s"k $k must be >= 2")

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] = {
    if (buf.size >= k && h >= buf.last) buf
    else {
      val i = lowerBound(buf, h)
      if (i < buf.size && buf(i) == h) buf // distinct: already present
      else {
        val grown = (buf.take(i) :+ h) ++ buf.drop(i)
        if (grown.size > k) grown.dropRight(1) else grown
      }
    }
  }

  // first index with buf(i) >= h
  private def lowerBound(buf: Seq[Long], h: Long): Int = {
    var lo = 0; var hi = buf.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < h) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    b.foldLeft(a)(reduce)

  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

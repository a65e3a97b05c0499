package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k per group as a custom typed `Aggregator` — the
  * scale-correct alternative to the `row_number` window pattern: a window
  * shuffles EVERY row of the group and sorts it, while this aggregator's
  * state never exceeds k rows, partial aggregation runs map-side, and
  * only ≤ k rows per group per partition cross the shuffle. The classic
  * "best k documents per domain/language" reduction at corpus scale.
  *
  * Determinism: elements are kept by the TOTAL order (score desc, id asc)
  * — top-k under a total order is a semilattice (merge is associative,
  * commutative, idempotent), so the result is identical under any
  * partitioning or merge tree, which is what lets a window-based oracle
  * replay it exactly.
  */
final class TopKAgg(k: Int)
  extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k >= 1, s"k $k must be positive")

  // (score desc, id asc) — better elements first
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)],
                      in: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.size < k) insert(buf, in)
    else if (better(in, buf.last)) insert(buf.dropRight(1), in)
    else buf
  }

  private def insert(buf: Seq[(Double, Long)],
                     in: (Double, Long)): Seq[(Double, Long)] = {
    val i = buf.indexWhere(e => better(in, e))
    if (i < 0) buf :+ in else (buf.take(i) :+ in) ++ buf.drop(i)
  }

  override def merge(a: Seq[(Double, Long)],
                     b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(reduce)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopK {

  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  /** df(groupCol, idCol, scoreCol) → (group, rank, id, score): top-k rows
    * per group by (score desc, id asc), reduced with the bounded
    * aggregator (state ≤ k, map-side partials) and exploded back to rows.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, idCol: String,
                   scoreCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new TopKAgg(k)
    df.select(col(groupCol).cast("string"), col(scoreCol).cast("double"),
        col(idCol).cast("long"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg.toColumn)
      .toDF(groupCol, "top")
      .select(col(groupCol), posexplode(col("top")).as(Seq("i", "e")))
      .select(col(groupCol), (col("i") + 1).as("rank"),
        col("e._2").as(idCol), col("e._1").as(scoreCol))
  }
}

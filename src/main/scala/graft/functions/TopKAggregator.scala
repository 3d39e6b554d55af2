package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k accumulator: the `Aggregator[IN, BUF, OUT]` face of the
  * engine's UDAF surface (SURVEY §2.2 UDAF row; §7.3 flagged this as the
  * specialization that beats window+filter top-k at scale).
  *
  * Unlike a ranking window — which shuffles and sorts every row of a key's
  * partition — an Aggregator runs partial→final like any hash aggregate: each
  * map task keeps at most k (score, id) pairs per key, so a hot (zipfian) key
  * shuffles k·partitions rows instead of its full row count. The reference
  * has no aggregation surface at all beyond the client's count loop
  * (reference main.c:33-43); this is the same "drain the group" contract in
  * bounded memory.
  *
  * Buffer is a sorted-descending list of (score, id), ties broken by smaller
  * id, capped at k — merge is a bounded merge of two sorted lists, so the
  * aggregation is associative and commutative as Spark requires.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Long), List[(Long, Long)], Seq[Long]] {

  private def insert(buf: List[(Long, Long)], e: (Long, Long)): List[(Long, Long)] = {
    // descending score, ascending id on ties
    val (hi, lo) = buf.span(b => b._1 > e._1 || (b._1 == e._1 && b._2 < e._2))
    (hi ::: e :: lo).take(k)
  }

  override def zero: List[(Long, Long)] = Nil

  override def reduce(buf: List[(Long, Long)], row: (Long, Long)): List[(Long, Long)] =
    insert(buf, row)

  override def merge(a: List[(Long, Long)], b: List[(Long, Long)]): List[(Long, Long)] =
    b.foldLeft(a)(insert)

  /** ids of the top-k rows, best first. */
  override def finish(buf: List[(Long, Long)]): Seq[Long] = buf.map(_._2)

  override def bufferEncoder: Encoder[List[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Long, Long)]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** Double-scored variant used by the similarity queries' gated top-k: emits
  * the ordered (score, id) pairs (best first) so callers can posexplode into
  * (rnk, cos, nbr_id) with the exact values the ranking-window form produced.
  *
  * Ordering is Spark's own descending double sort (java.lang.Double.compare:
  * NaN greatest, -0.0 < 0.0), ties broken by ascending id — bit-identical to
  * `Window.orderBy(score.desc, id)` + `row_number`, which is what the DuckDB
  * oracle expresses. Registered through `functions.udaf` it runs as an
  * ObjectHashAggregate partial→final, so each map task shuffles at most k
  * pairs per key instead of the key's full candidate set — the fix for the
  * per-query ranking window that serialized the whole scored corpus onto
  * |Q| tasks.
  */
class TopKPairsAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  // a ranks strictly before b under (score desc, id asc)
  private def before(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def insert(buf: List[(Double, Long)], e: (Double, Long)): List[(Double, Long)] = {
    val (hi, lo) = buf.span(b => before(b, e))
    (hi ::: e :: lo).take(k)
  }

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)], row: (Double, Long)): List[(Double, Long)] =
    insert(buf, row)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

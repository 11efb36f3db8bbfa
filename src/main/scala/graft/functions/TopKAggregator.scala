package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded-heap top-k aggregate — the `Aggregator[IN, BUF, OUT]`
  * extensibility lane (SURVEY.md §2.5: Beam's `DoFn` maps to, in preference
  * order, built-ins -> Aggregator -> custom Expression).
  *
  * Versus `rank().over(partitionBy(...).orderBy(...))`: the window form sorts
  * every row of every group; this aggregate keeps a k-element buffer per
  * group through partial aggregation — map-side combine bounds both memory
  * (O(k) per group per task) and shuffle volume (k rows per group per
  * partition, not the whole group). Equality with the window form is
  * oracle-checked (`q_topk_agg` shares `q_topk_per_group`'s SQL).
  */
object TopKAggregator {

  case class OrderRow(o_orderpriority: String, o_orderkey: Long, o_totalprice: Double)
  case class TopHit(rk: Long, o_orderkey: Long, o_totalprice: Double)

  /** ADC-scored candidate: distances stay DECIMAL end-to-end (the oracle
    * compares exact decimal strings; a double hop would re-round). The
    * encoder's default decimal(38,18) is a safe widening of the kernel's
    * (37,18) sums. */
  case class Scored(q_id: Long, n_id: Long, adist: BigDecimal)
  case class RankedHit(rk: Long, n_id: Long, adist: BigDecimal)

  /** Keeps the k smallest (adist asc, n_id asc) candidates per group — the
    * scale-safe replacement for `row_number().over(partitionBy(q_id))` in
    * ADC selection: the window form materializes ALL corpus scores of a
    * query in ONE task (a per-query funnel at 100 TB); this aggregate's
    * partial/merge lanes keep O(k) state per query per task and ship k rows
    * per query per partition. Ranking ties break by n_id, mirroring the
    * oracle's `ORDER BY adist, n_id`. */
  class MinKByDist(k: Int) extends Aggregator[Scored, List[(BigDecimal, Long)], Seq[RankedHit]] {
    private def better(a: (BigDecimal, Long), b: (BigDecimal, Long)): Boolean =
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

    override def zero: List[(BigDecimal, Long)] = Nil

    override def reduce(buf: List[(BigDecimal, Long)], row: Scored): List[(BigDecimal, Long)] =
      insert(buf, (row.adist, row.n_id))

    private def insert(buf: List[(BigDecimal, Long)], x: (BigDecimal, Long)): List[(BigDecimal, Long)] = {
      val (pre, post) = buf.span(better(_, x))
      (pre ::: x :: post).take(k)
    }

    override def merge(a: List[(BigDecimal, Long)], b: List[(BigDecimal, Long)]): List[(BigDecimal, Long)] =
      b.foldLeft(a)(insert)

    override def finish(buf: List[(BigDecimal, Long)]): Seq[RankedHit] =
      buf.zipWithIndex.map { case ((d, id), i) => RankedHit(i + 1L, id, d) }

    override def bufferEncoder: Encoder[List[(BigDecimal, Long)]] =
      ExpressionEncoder[List[(BigDecimal, Long)]]()
    override def outputEncoder: Encoder[Seq[RankedHit]] = ExpressionEncoder[Seq[RankedHit]]()
  }

  /** Integer-scored ANN candidate (SQ coarse phase: int8-code dot products
    * are exact longs — no decimal machinery needed). */
  case class ScoredL(q_id: Long, n_id: Long, iscore: Long)
  case class RankedHitL(rk: Long, n_id: Long, iscore: Long)

  /** Keeps the k largest (iscore desc, n_id asc) candidates per group —
    * same bounded-heap discipline as [[MinKByDist]] for integer scores. */
  class MaxKByScore(k: Int) extends Aggregator[ScoredL, List[(Long, Long)], Seq[RankedHitL]] {
    private def better(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    override def zero: List[(Long, Long)] = Nil

    override def reduce(buf: List[(Long, Long)], row: ScoredL): List[(Long, Long)] =
      insert(buf, (row.iscore, row.n_id))

    private def insert(buf: List[(Long, Long)], x: (Long, Long)): List[(Long, Long)] = {
      val (pre, post) = buf.span(better(_, x))
      (pre ::: x :: post).take(k)
    }

    override def merge(a: List[(Long, Long)], b: List[(Long, Long)]): List[(Long, Long)] =
      b.foldLeft(a)(insert)

    override def finish(buf: List[(Long, Long)]): Seq[RankedHitL] =
      buf.zipWithIndex.map { case ((s, id), i) => RankedHitL(i + 1L, id, s) }

    override def bufferEncoder: Encoder[List[(Long, Long)]] =
      ExpressionEncoder[List[(Long, Long)]]()
    override def outputEncoder: Encoder[Seq[RankedHitL]] = ExpressionEncoder[Seq[RankedHitL]]()
  }

  /** Keeps the k smallest DISTINCT longs, ascending — the KMV sketch state.
    * Insert dedupes, so the input stream needs NO separate distinct pass:
    * that is what lets the same code run as a SINGLE streaming aggregation
    * (two stacked stateful ops — distinct then min-k — would be rejected by
    * Structured Streaming). Min-k-distinct is associative, commutative and
    * idempotent, so partial/merge order and stream/batch split can never
    * change the sketch. */
  class MinKDistinct(k: Int) extends Aggregator[Long, (Int, List[Long]), Seq[Long]] {
    // Buffer = (size, DESCENDING list): head is the current kth-smallest,
    // so the steady-state row ("hash not below the kth") rejects in O(1)
    // with ZERO allocation — on a corpus-grain stream virtually every row
    // after the first k·ln(n) takes this path (the first version's
    // ascending list walked and re-allocated ~2k cells per row; measured
    // 4.8 s → sub-second at sf0.1).
    override def zero: (Int, List[Long]) = (0, Nil)

    private def insert(buf: (Int, List[Long]), x: Long): (Int, List[Long]) = {
      val (n, l) = buf
      if (n >= k && x >= l.head) buf
      else {
        val (pre, post) = l.span(_ > x)
        if (post.headOption.contains(x)) buf
        else if (n >= k) (n, (pre ::: x :: post).tail) // drop current largest
        else (n + 1, pre ::: x :: post)
      }
    }

    override def reduce(buf: (Int, List[Long]), x: Long): (Int, List[Long]) =
      insert(buf, x)
    override def merge(a: (Int, List[Long]), b: (Int, List[Long])): (Int, List[Long]) =
      b._2.foldLeft(a)(insert)
    override def finish(buf: (Int, List[Long])): Seq[Long] = buf._2.reverse

    override def bufferEncoder: Encoder[(Int, List[Long])] =
      ExpressionEncoder[(Int, List[Long])]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** A prioritized row carrying its value payload: the bottom-k-by-hash
    * uniform-sample state (`Merge.quantileSample`). */
  case class PriRow(q_id: Long, pri: Long, n_id: Long, v: Double)

  /** [[PriRow]] with a string grouping key (`Merge.quantileSketchByGroup`). */
  case class PriRowG(g: String, pri: Long, n_id: Long, v: Double)

  /** Keeps the k smallest (pri asc, n_id asc) rows WITH their double
    * payload — one pass, no join-back for the payload. Buffer is
    * DESCENDING by (pri, n_id) so the steady-state reject ("not below the
    * current kth") is O(1) with zero allocation, like [[MinKDistinct]].
    * Associative and commutative, so partitioning and stream/batch split
    * can never change the sample — which is what makes the same code a
    * single streaming aggregation (`StreamingOps.quantileSample`). */
  abstract class MinKByPriBase[IN](k: Int)
      extends Aggregator[IN, (Int, List[(Long, Long, Double)]), Seq[(Long, Double)]] {
    protected def key(in: IN): (Long, Long, Double)

    private def geq(a: (Long, Long, Double), p: Long, id: Long): Boolean =
      a._1 > p || (a._1 == p && a._2 >= id)

    override def zero: (Int, List[(Long, Long, Double)]) = (0, Nil)

    private def insert(buf: (Int, List[(Long, Long, Double)]),
                       x: (Long, Long, Double)): (Int, List[(Long, Long, Double)]) = {
      val (n, l) = buf
      if (n >= k && !geq(l.head, x._1, x._2)) buf
      else {
        val (pre, post) = l.span(a => a._1 > x._1 || (a._1 == x._1 && a._2 > x._2))
        if (n >= k) (n, (pre ::: x :: post).tail)
        else (n + 1, pre ::: x :: post)
      }
    }

    override def reduce(buf: (Int, List[(Long, Long, Double)]),
                        row: IN): (Int, List[(Long, Long, Double)]) =
      insert(buf, key(row))
    override def merge(a: (Int, List[(Long, Long, Double)]),
                       b: (Int, List[(Long, Long, Double)])): (Int, List[(Long, Long, Double)]) =
      b._2.foldLeft(a)(insert)
    override def finish(buf: (Int, List[(Long, Long, Double)])): Seq[(Long, Double)] =
      buf._2.reverse.map(t => (t._2, t._3))

    override def bufferEncoder: Encoder[(Int, List[(Long, Long, Double)])] =
      ExpressionEncoder[(Int, List[(Long, Long, Double)])]()
    override def outputEncoder: Encoder[Seq[(Long, Double)]] =
      ExpressionEncoder[Seq[(Long, Double)]]()
  }

  class MinKByPri(k: Int) extends MinKByPriBase[PriRow](k) {
    override protected def key(r: PriRow): (Long, Long, Double) =
      (r.pri, r.n_id, r.v)
  }

  class MinKByPriG(k: Int) extends MinKByPriBase[PriRowG](k) {
    override protected def key(r: PriRowG): (Long, Long, Double) =
      (r.pri, r.n_id, r.v)
  }

  /** Keeps the k largest (o_totalprice desc, o_orderkey asc) rows. */
  class TopKByPrice(k: Int) extends Aggregator[OrderRow, List[(Double, Long)], Seq[TopHit]] {
    private def better(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    override def zero: List[(Double, Long)] = Nil

    override def reduce(buf: List[(Double, Long)], row: OrderRow): List[(Double, Long)] =
      insert(buf, (row.o_totalprice, row.o_orderkey))

    private def insert(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] = {
      val (pre, post) = buf.span(better(_, x))
      (pre ::: x :: post).take(k)
    }

    override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
      b.foldLeft(a)(insert)

    override def finish(buf: List[(Double, Long)]): Seq[TopHit] =
      buf.zipWithIndex.map { case ((price, key), i) => TopHit(i + 1L, key, price) }

    override def bufferEncoder: Encoder[List[(Double, Long)]] =
      ExpressionEncoder[List[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[TopHit]] = ExpressionEncoder[Seq[TopHit]]()
  }
}

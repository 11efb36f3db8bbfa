package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass moment-grid aggregate behind `VectorOps.covarianceMatrix` —
  * the typed-Aggregator replacement for the exploded form's d²/2-per-row
  * amplification (see the operator scaladoc for the exploded twin, kept
  * for parity specs).
  *
  * The exploded form emits T = d(d+1)/2 pair rows PER INPUT ROW into a
  * hash aggregate: 2080 hash probes + decimal multiply-adds per vector at
  * d=64, and the aggregate hash map holds decimal objects per cell. This
  * aggregate keeps ONE flat long[] buffer per task — per vector it does a
  * tight triangular loop of integer multiply-adds, and partial buffers
  * merge elementwise, so the whole plan is scan → 1-buffer-per-partition
  * merge → 2080 output rows. No generated rows, no per-pair hashing, no
  * shuffle beyond the ~170 KB partial buffers.
  *
  * EXACTNESS (must match the decimal twin bit for bit):
  *  - the grid value q = floor(x·2²⁰) reproduces the SQL
  *    `floor(x * 1048576.0) cast long` including its saturating
  *    double→long cast;
  *  - per-cell sums accumulate in 128-bit (hi/lo long pairs) — the decimal
  *    twin's decimal(30,0) bound is ~2⁹⁹, inside i128, and the product
  *    q·q of two 2³¹-grid values already overflows a single long;
  *  - outputs surface as DOUBLE via BigInteger.doubleValue (IEEE
  *    round-to-nearest), the same correctly-rounded decimal→double cast
  *    the twin's final select performs;
  *  - NULL semantics: a pair cell exists when a row's array covers both
  *    positions (n counts those rows regardless of element nullity, like
  *    `count(lit(1))`); each sum skips null elements and surfaces NULL
  *    when it never saw a non-null operand (decimal `sum` of all-null).
  *  - ragged arrays: a length-L row contributes exactly its own
  *    triangular prefix, like the suffix-slice posexplode.
  * The only deliberate divergence: sums past decimal(30,0) would NULL in
  * the twin (non-ANSI decimal overflow) but stay exact here — the native
  * has a strictly wider exact range.
  */
object CovMomentAggregator {

  /** Flat buffer: `dims` = widest vector seen; `cells` holds 8 longs per
    * triangular cell idx(i,j) = j(j+1)/2 + i (i ≤ j), a layout that is
    * PREFIX-STABLE as dims grow — growing just extends the array:
    * [n, cx, sxHi, sxLo, cy, syHi, syLo, cxy] then sxy as 2 more =
    * actually 10 slots: n, cx, sxHi, sxLo, cy, syHi, syLo, cxy, sxyHi,
    * sxyLo. */
  case class CovBuf(var dims: Int, var cells: Array[Long])

  case class CovCell(i: Long, j: Long, n: Long,
                     sum_qx: Option[Double], sum_qy: Option[Double],
                     sum_qxy: Option[Double])

  private final val Slots = 10
  private def tri(d: Int): Int = d * (d + 1) / 2

  class MomentGrid
    extends Aggregator[Seq[java.lang.Double], CovBuf, Seq[CovCell]] {

    override def zero: CovBuf = CovBuf(0, Array.emptyLongArray)

    private def grow(b: CovBuf, d: Int): CovBuf = {
      if (d > b.dims) {
        val next = new Array[Long](tri(d) * Slots)
        System.arraycopy(b.cells, 0, next, 0, b.cells.length)
        b.dims = d
        b.cells = next
      }
      b
    }

    /** acc(hi, lo at base+off) += signed 128-bit (hi, lo). */
    private def add128(cells: Array[Long], base: Int, hi: Long, lo: Long): Unit = {
      val newLo = cells(base + 1) + lo
      val carry = if (java.lang.Long.compareUnsigned(newLo, lo) < 0) 1L else 0L
      cells(base) += hi + carry
      cells(base + 1) = newLo
    }

    override def reduce(b0: CovBuf, vec: Seq[java.lang.Double]): CovBuf = {
      if (vec == null) return b0
      val L = vec.length
      if (L == 0) return b0
      val b = grow(b0, L)
      // pre-grid once per element (the twin's floor(x*2^20) cast long,
      // including the saturating double->long narrowing)
      val q = new Array[Long](L)
      val nn = new Array[Boolean](L)
      val it = vec.iterator
      var idx = 0
      while (it.hasNext) {
        val x = it.next()
        if (x != null) { nn(idx) = true; q(idx) = math.floor(x * 1048576.0).toLong }
        idx += 1
      }
      val cells = b.cells
      var j = 0
      while (j < L) {
        val rowBase = tri(j) // idx(0, j) = j(j+1)/2
        val qj = q(j); val nnj = nn(j)
        var i = 0
        while (i <= j) {
          val base = (rowBase + i) * Slots
          cells(base) += 1L // n
          if (nn(i)) { cells(base + 1) += 1L; add128(cells, base + 2, q(i) >> 63, q(i)) }
          if (nnj) { cells(base + 4) += 1L; add128(cells, base + 5, qj >> 63, qj) }
          if (nn(i) && nnj) {
            cells(base + 7) += 1L
            add128(cells, base + 8, Math.multiplyHigh(q(i), qj), q(i) * qj)
          }
          i += 1
        }
        j += 1
      }
      b
    }

    override def merge(a0: CovBuf, c: CovBuf): CovBuf = {
      val a = grow(a0, c.dims)
      val n = c.cells.length / Slots
      var cell = 0
      while (cell < n) {
        val base = cell * Slots
        a.cells(base) += c.cells(base)
        a.cells(base + 1) += c.cells(base + 1)
        add128(a.cells, base + 2, c.cells(base + 2), c.cells(base + 3))
        a.cells(base + 4) += c.cells(base + 4)
        add128(a.cells, base + 5, c.cells(base + 5), c.cells(base + 6))
        a.cells(base + 7) += c.cells(base + 7)
        add128(a.cells, base + 8, c.cells(base + 8), c.cells(base + 9))
        cell += 1
      }
      a
    }

    /** Correctly-rounded i128 → double (the decimal→double cast). */
    private def toDouble(hi: Long, lo: Long): Double = {
      if (hi == 0L && lo >= 0L) lo.toDouble
      else if (hi == -1L && lo < 0L) lo.toDouble
      else {
        val bytes = java.nio.ByteBuffer.allocate(16)
        bytes.putLong(hi); bytes.putLong(lo)
        new java.math.BigInteger(bytes.array()).doubleValue()
      }
    }

    override def finish(b: CovBuf): Seq[CovCell] = {
      val out = Seq.newBuilder[CovCell]
      var j = 0
      while (j < b.dims) {
        var i = 0
        while (i <= j) {
          val base = (tri(j) + i) * Slots
          val n = b.cells(base)
          if (n > 0) {
            def sum(cntOff: Int, off: Int): Option[Double] =
              if (b.cells(base + cntOff) == 0) None
              else Some(toDouble(b.cells(base + off), b.cells(base + off + 1)))
            out += CovCell(i.toLong, j.toLong, n,
              sum(1, 2), sum(4, 5), sum(7, 8))
          }
          i += 1
        }
        j += 1
      }
      out.result()
    }

    override def bufferEncoder: Encoder[CovBuf] = ExpressionEncoder[CovBuf]()
    override def outputEncoder: Encoder[Seq[CovCell]] =
      ExpressionEncoder[Seq[CovCell]]()
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row scoring/stats expressions for the text-pipeline hot paths whose
  * higher-order-function forms evaluate one interpreted lambda chain per
  * token (or per token PAIR) — the round-10 measured batch, following the
  * [[MinHashSignature]] precedent: the operator calls the native directly,
  * the portable HOF twin stays available for parity specs and as the
  * engine-portable documentation of the exact arithmetic.
  *
  * All three are CodegenFallback: the per-row call overhead is amortized
  * over hundreds-to-thousands of internal operations per call.
  */
private[graft] object HexUtil {
  /** `conv(substr(md5_hex, 1, 15), 16, 10)` as a long — the first 15
    * nibbles of a digest parsed directly (60 bits, always non-negative),
    * no hex-string round trip. */
  def first15Nibbles(digest: Array[Byte]): Long = {
    var v = 0L
    var k = 0
    while (k < 15) {
      val b = digest(k >> 1) & 0xff
      val nib = if ((k & 1) == 0) b >> 4 else b & 0xf
      v = v * 16 + nib
      k += 1
    }
    v
  }
}

/** Linear-model token scoring in one pass: for each token,
  * `weight[conv(substr(md5(tok), 1, 15), 16, 10) % nFeatures]`, summed —
  * plus the token count, in ONE tokenization (the HOF form under
  * `Classifier.scoreUnsorted` evaluates the split chain twice and walks a
  * 1000-entry map LITERAL per token: Catalyst's `element_at` on an
  * ArrayBasedMapData is a linear key scan, so each token paid an O(model)
  * lookup where this expression pays O(1) on a prebuilt HashMap).
  *
  * Output struct<n_feats, score>; parity with the HOF corner for corner:
  *  - a NULL token makes `md5(null)` NULL, the map lookup NULL, and the
  *    sum NULL-poisoned — score is NULL, n_feats still counts every slot;
  *  - a feature id absent from the weight map mirrors `element_at`'s
  *    missing-key NULL (reachable only with a partial model);
  *  - the long sum cannot overflow for |weight| <= 1000 below 2^52 tokens
  *    per document, so ANSI-vs-wrap divergence is unreachable. */
case class TokenScore(child: Expression, nFeatures: Int,
                      weights: Map[Long, Long])
    extends UnaryExpression with CodegenFallback {
  require(nFeatures > 0, s"nFeatures must be positive, got $nFeatures")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${child.dataType.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_feats", LongType, nullable = false),
    StructField("score", LongType, nullable = true)))
  override def prettyName: String = "token_score"

  @transient private lazy val table: java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long](weights.size * 2)
    weights.foreach { case (k, v) => m.put(k, v) }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var score = 0L
    var poisoned = false
    var i = 0
    while (i < n && !poisoned) {
      if (arr.isNullAt(i)) poisoned = true
      else {
        val d = HashUtil.md5(arr.getUTF8String(i).getBytes)
        val f = HexUtil.first15Nibbles(d) % nFeatures
        val w = table.get(f)
        if (w == null) poisoned = true
        else score += w.longValue()
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n.toLong,
      if (poisoned) null else score))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** The Gopher-rule per-token statistics in one pass:
  * struct<total_len, n_alpha, max_tf> over a token array —
  *  - `total_len` = Σ length(tok) in CHARACTERS (`aggregate(w, 0L,
  *    (a,x) -> a + length(x))`): a NULL token NULL-poisons, like the fold;
  *  - `n_alpha` = count of tokens containing any of a–z
  *    (`size(filter(w, rlike '[a-z]'))`): NULL tokens drop, never count;
  *  - `max_tf` = max term frequency (`array_max(transform(array_distinct(w),
  *    x -> size(filter(w, y -> y = x))))`): the HOF is O(distinct·n)
  *    interpreted lambda steps per row — quadratic in the token count for
  *    high-diversity docs — where one counting pass is O(n). NULL elements
  *    contribute a 0 (y = NULL matches nothing), so they never affect the
  *    max unless ALL elements are NULL (max 0); an EMPTY array yields NULL
  *    (array_max of nothing), matching the pre-coalesce HOF value. */
case class GopherStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${child.dataType.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("total_len", LongType, nullable = true),
    StructField("n_alpha", LongType, nullable = false),
    StructField("max_tf", LongType, nullable = true)))
  override def prettyName: String = "gopher_stats"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var totalLen = 0L
    var lenPoisoned = false
    var nAlpha = 0L
    var sawNull = false
    val counts = new java.util.HashMap[UTF8String, Long](n * 2)
    var maxTf = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) { lenPoisoned = true; sawNull = true }
      else {
        val t = arr.getUTF8String(i)
        totalLen += t.numChars()
        val s = t.toString
        var j = 0
        var alpha = false
        while (j < s.length && !alpha) {
          val c = s.charAt(j)
          if (c >= 'a' && c <= 'z') alpha = true
          j += 1
        }
        if (alpha) nAlpha += 1
        val c = counts.merge(t, 1L, (a, b) => a + b)
        if (c > maxTf) maxTf = c
      }
      i += 1
    }
    val maxOut: Any =
      if (n == 0) null                      // array_max over an empty transform
      else maxTf                            // all-null arrays max over [0,...] = 0
    new GenericInternalRow(Array[Any](
      if (lenPoisoned) null else totalLen, nAlpha, maxOut))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Content-defined-chunking boundary positions in one pass:
  * `array_distinct(concat(filter(sequence(window, n), i ->
  *   conv(substr(md5(array_join(slice(w, i−window+1, window), ' ')), 1, 15),
  *        16, 10) % divisor = 0), array(n)))`
  * — the `ContentChunking.cdcChunks` boundary scan. The HOF allocates a
  * slice array, joins it, hex-encodes the digest, and string-parses 15 hex
  * chars back into a long PER WINDOW; the native digests each window's
  * bytes directly (array_join's null-skip reproduced) and parses nibbles
  * off the raw digest. A document shorter than `window` yields `[n]`; a
  * NULL token array yields `[null]` (the HOF's `when` falls to the empty
  * arm and `array(n)` carries a NULL size). */
case class CdcBoundaries(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression with CodegenFallback {
  require(window > 0 && divisor > 0,
    s"window and divisor must be positive, got $window / $divisor")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${child.dataType.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = child.nullable)
  override def nullable: Boolean = false
  override def prettyName: String = "cdc_boundaries"

  private val Sep = " ".getBytes("UTF-8")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(Array[Any](null))
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](math.max(4, n / divisor))
    val parts = new scala.collection.mutable.ArrayBuffer[Array[Byte]](2 * window)
    var i = window // 1-based window END position
    while (i <= n) {
      parts.clear()
      var j = i - window // 0-based window start
      while (j < i) {
        if (!arr.isNullAt(j)) {
          if (parts.nonEmpty) parts += Sep
          parts += arr.getUTF8String(j).getBytes
        }
        j += 1
      }
      val d = HashUtil.md5(parts.toSeq: _*)
      if (HexUtil.first15Nibbles(d) % divisor == 0) out += i
      i += 1
    }
    if (out.isEmpty || out.last != n) out += n
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextScoreFunctions {
  def token_score(toks: Column, nFeatures: Int, weights: Map[Long, Long]): Column =
    ColumnBridge.column(TokenScore(ColumnBridge.expression(toks), nFeatures, weights))
  def gopher_stats(toks: Column): Column =
    ColumnBridge.column(GopherStats(ColumnBridge.expression(toks)))
  def cdc_boundaries(toks: Column, window: Int, divisor: Int): Column =
    ColumnBridge.column(CdcBoundaries(ColumnBridge.expression(toks), window, divisor))
}

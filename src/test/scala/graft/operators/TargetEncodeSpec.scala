package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** K-fold target-encoding semantics: the closed-form replay, the
  * only-in-own-fold → prior collapse, and the LEAKAGE guarantee (a fold's
  * own labels never influence its encoding). */
class TargetEncodeSpec extends SparkSpec {

  // (id, category, label): fold = id % 2
  private def df(rows: (Long, String, Int)*) = {
    import spark.implicits._
    rows.toDF("id", "cat", "y")
  }

  private def enc(d: org.apache.spark.sql.DataFrame, m: Long = 20L)
  : Map[(String, Long), Double] =
    Classifier.targetEncode(d, "cat", "id", col("y"), kFolds = 2, m = m)
      .collect()
      .map(r => (r.getAs[String]("category"), r.getAs[Long]("fold")) ->
        r.getAs[Double]("encoded")).toMap

  test("closed form replay: ((S_c-S_cf)(N-N_f) + m(S-S_f)) / ((C_c-C_cf+m)(N-N_f))") {
    val d = df(
      (0L, "a", 1), (2L, "a", 0), (1L, "a", 1), (3L, "a", 1),
      (4L, "b", 0), (5L, "b", 1))
    // cat a fold 0: S_c=3, S_cf=1, C_c=4, C_cf=2; N=6, N_f=3, S=4, S_f=1
    // enc = ((3-1)*(6-3) + 20*(4-1)) / ((4-2+20)*(6-3)) = 66/66 = 1.0... m=20
    val e = enc(d)
    assert(e(("a", 0L)) == ((3.0 - 1) * 3 + 20 * 3) / ((4 - 2 + 20.0) * 3))
    // cat b fold 1: S_c=1, S_cf=1, C_c=2, C_cf=1; N_f=3 (ids 1,3,5), S_f=3
    // enc = ((1-1)*(6-3) + 20*(4-3)) / ((2-1+20)*(6-3))
    assert(e(("b", 1L)) == (0.0 * 3 + 20 * 1) / (21.0 * 3))
  }

  test("category seen ONLY in its own fold encodes to exactly the out-of-fold prior") {
    val d = df(
      (0L, "solo", 1), (2L, "solo", 1),          // 'solo' only in fold 0
      (1L, "x", 1), (3L, "x", 0), (5L, "x", 1),  // fold-1 mass
      (4L, "x", 0))
    val e = enc(d)
    // prior_0 = (S - S_0)/(N - N_0): fold0 = ids 0,2,4 (S_0=2, N_0=3)
    // S=4, N=6 -> prior = 2/3; formula must collapse to it exactly
    assert(e(("solo", 0L)) == (20.0 * 2) / (20.0 * 3))
  }

  test("leakage guarantee: flipping every fold-0 label leaves fold-0 encodings unchanged") {
    val base = df(
      (0L, "a", 1), (2L, "a", 0), (4L, "a", 1), (6L, "b", 0),
      (1L, "a", 0), (3L, "b", 1), (5L, "b", 0), (7L, "a", 1))
    val flipped = base.withColumn("y",
      when(pmod(col("id"), lit(2)) === 0, lit(1) - col("y")).otherwise(col("y")))
    val (e0, e1) = (enc(base), enc(flipped))
    for (cat <- Seq("a", "b")) {
      assert(e0((cat, 0L)) == e1((cat, 0L)), s"fold-0 enc of $cat leaked")
      // sanity: fold-1 encodings DO move (they legitimately read fold-0 labels)
    }
    assert(e0(("a", 1L)) != e1(("a", 1L)))
  }

  test("smoothing limit: m=0 gives the raw out-of-fold category mean") {
    val d = df(
      (0L, "a", 1), (2L, "a", 1), (1L, "a", 1), (3L, "a", 0),
      (4L, "b", 0), (5L, "b", 0))
    // cat a fold 0 with m=0: (S_c-S_cf)/(C_c-C_cf) = (3-2)/(4-2) = 1/2
    assert(enc(d, m = 0L)(("a", 0L)) == 0.5)
  }
}

package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** A/B power-report semantics: hand-replayed MDE / required-n arithmetic
  * and the zero-effect degenerate. */
class AbPowerSpec extends SparkSpec {

  /** users: (user_id, nPurchases) — 15+ purchases = converted. */
  private def ev(users: (Long, Int)*) = {
    import spark.implicits._
    users.flatMap { case (u, k) =>
      (0 until math.max(k, 1)).map { i =>
        (u, u * 1000 + i,
          new Timestamp(1000L * (1000 + i)),
          if (i < k) "purchase" else "view")
      }
    }.toDF("user_id", "event_id", "ts", "event_type")
  }

  test("hand case: exact diff, replayed mde and ceil'd required n") {
    // arm 0 (even ids): users 0 (15 conv), 2 (0) -> p_a = 1/2
    // arm 1 (odd ids): users 1 (15), 3 (15)      -> p_b = 1
    val df = ev((0L, 15), (2L, 0), (1L, 15), (3L, 15))
    val r = Funnel.abTestPower(df).head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("p_a") == 0.5 && r.getAs[Double]("p_b") == 1.0)
    assert(r.getAs[Double]("diff") == -0.5)
    val zSum = 1.96 + 0.8416212335729143
    val pPool = 3.0 / 4.0
    val mde = zSum * math.sqrt(pPool * (1.0 - pPool) * (1.0 / 2.0 + 1.0 / 2.0))
    assert(r.getAs[Double]("mde") == mde)
    val nReq = math.ceil(zSum * zSum * (0.5 * 0.5 + 1.0 * 0.0) / (0.5 * 0.5)).toLong
    assert(r.getAs[Long]("n_req_per_arm") == nReq)
    assert(r.getAs[Boolean]("powered") == (0.5 >= mde))
  }

  test("zero observed effect: required n is null, not a division error") {
    val df = ev((0L, 15), (2L, 0), (1L, 15), (3L, 0))
    val r = Funnel.abTestPower(df).head()
    assert(r.getAs[Double]("diff") == 0.0)
    assert(r.isNullAt(r.fieldIndex("n_req_per_arm")))
    // |0| >= mde only when mde is 0 too; here pool is interior -> mde > 0
    assert(!r.getAs[Boolean]("powered"))
  }
}

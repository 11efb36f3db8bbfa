package graft.operators

import graft.SparkSpec

class LuhnAuditSpec extends SparkSpec {
  import spark.implicits._

  private def audit(text: String): (Long, Long) = {
    val r = TextAnalysis.luhnAudit(Seq((1L, text)).toDF("doc_id", "text"))
      .first()
    (r.getAs[Long]("n_digit_runs"), r.getAs[Long]("n_luhn_valid"))
  }

  test("valid card numbers verify; off-by-one check digits do not") {
    assert(audit("pay 4539578763621486 now") == ((1L, 1L)))
    assert(audit("pay 4539578763621487 now") == ((1L, 0L)))
    // classic test numbers
    assert(audit("4111111111111111") == ((1L, 1L)))
    assert(audit("378282246310005 amex") == ((1L, 1L)))
  }

  test("length gating: short and over-long digit runs are not candidates") {
    assert(audit("order 123456789012 shipped") == ((0L, 0L)))          // 12
    assert(audit("id 12345678901234567890 x") == ((0L, 0L)))           // 20
    assert(audit("ts 1700000000000 n") == ((1L, 0L)))                  // 13, not Luhn
  }

  test("multiple runs count independently") {
    assert(audit("a 4111111111111111 b 4539578763621487 c 99")
      == ((2L, 1L)))
  }
}

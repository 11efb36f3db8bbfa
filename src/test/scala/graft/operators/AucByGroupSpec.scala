package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AucByGroupSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(String, Double, Boolean)]): Map[String, Option[Double]] =
    Relational.aucByGroup(rows.toDF("g", "v", "y"), "g", "v", col("y"))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap

  test("perfect separation is 1.0; reversed is 0.0; pure ties are 0.5") {
    val r = auc(
      Seq(("sep", 1.0, false), ("sep", 2.0, false), ("sep", 3.0, true),
        ("sep", 4.0, true),
        ("rev", 1.0, true), ("rev", 2.0, true), ("rev", 3.0, false),
        ("tie", 5.0, true), ("tie", 5.0, false), ("tie", 5.0, true)))
    assert(r("sep").contains(1.0))
    assert(r("rev").contains(0.0))
    assert(r("tie").contains(0.5))
  }

  test("hand-computed mixed case with a tie across classes") {
    // pos values {2, 3}, neg values {1, 3}: pairs = 4
    // (2>1)=1, (2vs3)=0, (3>1)=1, (3==3)=0.5 -> AUC = 2.5/4 = 0.625
    val r = auc(Seq(("m", 2.0, true), ("m", 3.0, true),
      ("m", 1.0, false), ("m", 3.0, false)))
    assert(r("m").contains(0.625))
  }

  test("single-class groups yield NULL") {
    val r = auc(Seq(("p", 1.0, true), ("p", 2.0, true),
      ("n", 1.0, false)))
    assert(r("p").isEmpty && r("n").isEmpty)
  }

  test("partition invariance") {
    val rows = (1 to 2000).map(i =>
      (s"g${i % 5}", (i * 31 % 97).toDouble, i % 3 == 0)).toDF("g", "v", "y")
    def run(p: Int) =
      Relational.aucByGroup(rows.repartition(p), "g", "v", col("y"))
        .collect().map(_.toSeq).toSeq
    assert(run(1) == run(13))
  }
}

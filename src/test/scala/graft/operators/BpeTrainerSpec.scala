package graft.operators

import graft.SparkSpec

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  test("merges are leftmost non-overlapping with deterministic tie-breaks") {
    // "a a a b": step 1 fuses the leftmost (a,a) run pair-wise -> "(a a)(a)(b)"
    // step 2: ("a a","a") and ("a","b") tie at 1 -> left-text order picks (a,b)
    // step 3: the fused units pair up
    val df = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val r = BpeTrainer.merges(df, steps = 3)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(r == Seq(
      (1L, "a", "a", 2L),
      (2L, "a", "b", 1L),
      (3L, "a a", "a b", 1L)))
  }

  test("training stops emitting steps once no pairs remain") {
    val df = Seq((1L, "x y")).toDF("doc_id", "text")
    val r = BpeTrainer.merges(df, steps = 4)
      .as[(Long, String, String, Long)].collect().toSeq
    // one merge exhausts the doc into a single unit; steps 2..4 emit nothing
    assert(r == Seq((1L, "x", "y", 1L)))
  }

  test("merge frequencies aggregate across documents") {
    val df = Seq((1L, "c d"), (2L, "c d"), (3L, "c e")).toDF("doc_id", "text")
    val r = BpeTrainer.merges(df, steps = 1)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(r == Seq((1L, "c", "d", 2L)))
  }
}

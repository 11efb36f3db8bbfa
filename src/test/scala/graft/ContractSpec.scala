package graft

/** Guards the driver contract itself — a drifted map would silently weaken
  * the correctness gate in a later round. */
class ContractSpec extends SparkSpec {

  test("every oracle belongs to a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query has an oracle (no rows-only exceptions left)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"queries without oracles: $rowsOnly")
  }

  test("every query analyzes against sf0.001 (schema resolvable, no analysis errors)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val schema = fn(spark, sf).schema // forces analysis, not execution
      assert(schema.nonEmpty, s"$name resolved to an empty schema")
    }
  }

  test("entry() targets sf0.001 and resolves") {
    assert(SparkEntry.entry(spark).schema.fieldNames.toSeq ==
      Seq("chunk_id", "lo", "hi"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * When one join key carries a disproportionate share of rows, the sort-merge
  * / shuffle-hash task for that key becomes the straggler (AQE's skew-join
  * splitting handles sort-merge joins; salting is the explicit form and also
  * works for aggregations). The fact side gets a deterministic salt derived
  * from a unique column; the dimension side is exploded `numSalts` times so
  * every (key, salt) bucket finds its match. Result set identical to the
  * unsalted join — proven in SkewJoinSpec.
  */
object SkewJoin {

  /** Inner join `left` (large, skewed) with `right` (smaller) on `keys`,
    * spreading each left key over `numSalts` buckets. `saltSource` must be a
    * deterministic left column (e.g. a unique id) so runs are reproducible. */
  def salted(left: DataFrame, right: DataFrame, keys: Seq[String],
             saltSource: Column, numSalts: Int = 8): DataFrame = {
    val salted = left.withColumn("__salt", pmod(hash(saltSource), lit(numSalts)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until numSalts).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — the manual skew-mitigation lane for the case AQE's
  * skew-join splitting can't reach: a HOT KEY on the big side whose rows
  * outnumber what one task can hold, joined to a small-but-not-broadcastable
  * side.
  *
  * Mechanics: every big-side row gets a deterministic salt in [0, salts)
  * derived from CONTENT (xxhash64 of caller-named unique columns — never
  * `rand()`, which breaks retry determinism and the oracle); the other side
  * replicates each row `salts` times, once per salt value. Joining on
  * (keys..., salt) then matches every qualifying row pair exactly once —
  * identical output to the plain join (oracle-proven) — while a hot key's
  * rows spread over `salts` reducers instead of one.
  *
  * Cost model: the replicated side grows `salts`x, so pick the SMALLER side
  * to replicate and keep `salts` near the observed skew factor. When the
  * small side fits in a broadcast, use `broadcast()` instead (no shuffle at
  * all); salting is the middle regime — too big to broadcast, too skewed to
  * hash-partition flat. AQE's `skewJoin` handles the post-shuffle variant of
  * the same problem; salting moves the fix INTO the key so it also works
  * where AQE declines (e.g. under windowed or bucketed constraints).
  */
object SaltedJoin {

  /** Inner equi-join of `big` and `replicated` on `keys`, salted `salts`
    * ways. `saltBy` must name big-side columns forming a (near-)unique row
    * identity — the salt is `xxhash64(saltBy...) mod salts`, so a hot join
    * key's rows distribute uniformly while every row keeps a stable salt
    * across retries and re-runs. */
  def salted(big: DataFrame, replicated: DataFrame, keys: Seq[String],
             saltBy: Seq[String], salts: Int = 8): DataFrame = {
    require(salts > 0, "salts must be positive")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(saltBy.map(col): _*), lit(salts.toLong)).cast("int"))
    val repS = replicated.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(repS, keys :+ "__salt").drop("__salt")
  }
}

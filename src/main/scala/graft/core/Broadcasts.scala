package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Guarded broadcast hints for the asymmetric-join operators.
  *
  * Several operators force `broadcast()` on a side that is small BY
  * CONTRACT (an update batch's key set, a per-group stat table): the hint
  * is what keeps the 100 TB side shuffle-free, so it must not silently
  * disappear under a planner heuristic. But a forced broadcast has a hard
  * failure mode — Spark caps a broadcast relation at 8 GB and the driver
  * and every executor must hold it — so a caller whose "small" side might
  * not be small can opt into a row-count guard: when the side exceeds the
  * limit, the hint is dropped and the planner falls back to a plain
  * (shuffle) join, trading the shuffle-free plan for not failing the job.
  *
  * The guard costs one `count()` action over the SMALL side only; the
  * default (`None`) keeps the unconditional hint and costs nothing.
  */
object Broadcasts {

  /** `small` with a broadcast hint, unless `guardRows` is set and the
    * frame's row count exceeds it (then unhinted — planner's choice). */
  def guarded(small: DataFrame, guardRows: Option[Long]): DataFrame =
    guardRows match {
      case Some(limit) if small.count() > limit => small
      case _                                    => broadcast(small)
    }
}

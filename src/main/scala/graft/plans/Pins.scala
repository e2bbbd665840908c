package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftshim.Shims

/** The engine's standard iterative-frame pin: eager `localCheckpoint`
  * (truncate lineage, materialize once) PLUS origin-statistics reset
  * (`Shims.dropCheckpointStats`).
  *
  * Why the second half matters: `localCheckpoint` preserves the source
  * plan's estimated statistics, and Catalyst's size-only estimator
  * multiplies child sizes at every join — so in a loop that pins each
  * round's result and joins it again, the carried sizeInBytes is a
  * product of products whose BigInt DIGIT COUNT grows with every round.
  * At sf0.1, louvain level-2's round 6 spent >100 s of driver CPU inside
  * `BigInteger.multiplyToomCook3` computing million-digit size estimates
  * for 6 k-row frames (round-8 jstack profile; 403 s → ~25 s after the
  * reset, BASELINE.md). Every iterative operator pins through here so
  * none can regress into that mode. */
object Pins {
  def pin(df: DataFrame): DataFrame =
    Shims.dropCheckpointStats(df.localCheckpoint(true))

  implicit class PinnedOps(private val df: DataFrame) extends AnyVal {
    /** `df.localCheckpoint(true)` with origin stats dropped. */
    def pinned: DataFrame = pin(df)
  }

}
// Note (round-11 negative result, BASELINE.md): disabling AQE for the
// scope of the iterative pin loops was measured BOTH ways at sf0.1 —
// g_hits min −21% (its round has two independent branches AQE
// serializes), but g_scc 4.8→16.4 s and g_louvain2 19→47 s. With pins
// stats-dropped, AQE's runtime broadcast-join conversion is what keeps
// the loop joins hash-broadcast; statically planned they fall back to
// 32-partition sort-merge joins. AQE stays ON everywhere.

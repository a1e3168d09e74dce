package graft.core

import org.apache.spark.sql.DataFrame

/** How iterative loops pin per-round state (truncate lineage + materialize).
  *
  * The reference never persists anything — its plans double in depth per
  * superstep (pregel.py:45-75, SURVEY.md §3.2). Every graft loop pins
  * per-round, and the policy decides where the pinned blocks live:
  *
  *  - [[CheckpointPolicy.Local]] (default): `localCheckpoint` — blocks on
  *    executor block managers. Fastest, but NOT fault-tolerant: losing one
  *    executor mid-iteration loses blocks and, with lineage truncated,
  *    kills the job. Right for local mode and short interactive runs.
  *  - [[CheckpointPolicy.Reliable]]: `checkpoint` to the session's
  *    checkpoint directory (HDFS/S3 on a cluster). One write+read of the
  *    pinned state per round buys survival of executor loss — the correct
  *    setting for 100 TB jobs where some executor failure per hour is the
  *    expected case, not the exception. Requires
  *    `spark.sparkContext.setCheckpointDir(...)` up front.
  */
sealed trait CheckpointPolicy {
  /** Pin `df`: truncate lineage; materialize now (`eager`) or on the
    * caller's next action over the result (lazy — lets one job per round
    * both materialize and compute the convergence scalar). */
  def pin(df: DataFrame, eager: Boolean = true): DataFrame
}

object CheckpointPolicy {

  case object Local extends CheckpointPolicy {
    def pin(df: DataFrame, eager: Boolean = true): DataFrame =
      df.localCheckpoint(eager)
  }

  /** No pinning at all: `pin` returns the frame unchanged, so every
    * round re-evaluates its input plan. WRONG for long loops (lineage
    * doubles per round — the reference's failure this trait exists to
    * fix) but RIGHT when the loop-invariant inputs are already
    * materialized in a layout the per-round plan exploits: a
    * checkpointed frame reports UnknownPartitioning under AQE, so
    * localCheckpoint-pinning the routing table of a BUCKETED edge table
    * ([[graft.sources.GraphIO.writeBucketed]]) would force the src
    * exchange back into every round, while re-reading the bucketed
    * table costs a scan and NO shuffle (GraphIOSpec asserts both
    * sides). Use for the static side of an iteration over bucketed
    * storage; keep Local/Reliable for the evolving per-round state. */
  case object Passthrough extends CheckpointPolicy {
    def pin(df: DataFrame, eager: Boolean = true): DataFrame = df
  }

  case object Reliable extends CheckpointPolicy {
    def pin(df: DataFrame, eager: Boolean = true): DataFrame = {
      require(
        df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "CheckpointPolicy.Reliable needs spark.sparkContext.setCheckpointDir(...)")
      df.checkpoint(eager)
    }
  }
}

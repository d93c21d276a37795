package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage truncation for driver-loop iterative operators
  * ([[Graph.pageRank]], [[Dedup.connectedComponents]] and its star
  * contraction): each round must materialize its state or round N
  * replays rounds 1…N−1.
  *
  * Two durability shapes, chosen by the operators' `reliable` flag:
  *
  *  - `reliable = false` (default): `localCheckpoint` — executor-pinned
  *    blocks, no filesystem round-trip. Measured faster at local[32]
  *    and the right call there, but lineage is TRUNCATED: on a real
  *    cluster one executor loss aborts iteration N of the whole job
  *    (there is no recompute path). Fine for minutes-long local jobs.
  *  - `reliable = true`: `Dataset.checkpoint()` to the directory set
  *    via `spark.sparkContext.setCheckpointDir` — each round's state is
  *    durable, so executor loss costs a re-read, not the job. The
  *    durability trade: one distributed write + read per round, and
  *    superseded round files stay on disk until the ContextCleaner
  *    collects them (`spark.cleaner.referenceTracking.cleanCheckpoints`)
  *    or the application ends. At 100 TB over hours-long iterations
  *    executor loss is a certainty, not a risk — use this.
  *
  * Results are identical in both modes (spec-pinned); only failure
  * recovery and per-round cost differ.
  */
private[ops] object Checkpoints {

  /** Materialize `df` eagerly with truncated lineage under the chosen
    * durability. Throws (from Spark) if `reliable` and no checkpoint
    * dir has been set — loud, at the first round, not mid-job. */
  def materialize(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) df.checkpoint() else df.localCheckpoint()

  /** Release a SUPERSEDED round's materialization. Local blocks are
    * unpersisted eagerly (pinning O(rounds) block sets was the measured
    * dispersion escalation of BENCH_r04); reliable checkpoint files are
    * left to the ContextCleaner — deleting them here could race a
    * still-running read of the new round's plan. */
  def release(df: DataFrame, reliable: Boolean): Unit =
    if (!reliable)
      org.apache.spark.sql.graftshim.Shim.unpersistLocalCheckpoint(df)
}

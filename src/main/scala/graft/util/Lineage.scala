package graft.util

import org.apache.spark.sql.DataFrame

/** Lineage cut with a plan-inspection escape hatch.
  *
  * Operators that end in (or pass through) an eager `localCheckpoint`
  * return a `Scan ExistingRDD` plan — correct and fast, but opaque:
  * `.explain` shows nothing of the computation, so optimization-round
  * plan evidence ("the after-plan contains the round-robin exchange")
  * cannot be captured from the public entry point (the round-18 p3/
  * p36/p40 dumps were vacuous for exactly this reason).
  *
  * `spark.graft.explain.keepLineage=true` (set ONLY by
  * [[graft.tools.PlanDump]]) skips the checkpoint so the full lineage
  * reaches the plan printer. Results are identical either way — the
  * checkpoint is materialization, not semantics — but without it the
  * upstream (often a `persist`ed relation unpersisted in the
  * operator's `finally`) recomputes per action, so the flag must never
  * be on for timed or verified runs. */
object Lineage {
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get(
        "spark.graft.explain.keepLineage", "false").toBoolean) df
    else df.localCheckpoint()
}

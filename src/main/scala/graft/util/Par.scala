package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, LocalTableScanExec,
  RDDScanExec, ExternalRDDScanExec, SparkPlan}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Scan-parallelism guard for CPU-heavy map work (guide §2.5, the
  * unsplittable-input case): a single-row-group parquet file plans as
  * ONE scan task, and everything Catalyst fuses into that stage —
  * tokenization, shingle/window construction, per-row digests — runs
  * single-threaded no matter how many cores the session has.
  *
  * [[spread]] widens a narrow input to the session's default
  * parallelism with one round-robin exchange of the RAW rows, so the
  * expensive per-row work above it runs on every core. It is a no-op
  * whenever the input already plans at least `defaultParallelism`
  * partitions — at production scale (many files / row groups) the
  * exchange never appears, so this cannot REDUCE parallelism or add a
  * shuffle where the scan is already wide.
  *
  * The width probe is STATIC: it reads partition counts off the
  * planned leaves (file-scan splits, checkpointed/local RDDs, DSv2
  * input partitions) of `queryExecution.sparkPlan` and never touches
  * `df.rdd` — under AQE, materializing the RDD executes every upstream
  * shuffle stage just to read a partition count, and the caller's real
  * action then re-executes them (no cross-query shuffle reuse).
  * Inputs that already contain a shuffle exchange — or an unrecognized
  * leaf — are treated as wide and passed through: a post-shuffle
  * relation plans `spark.sql.shuffle.partitions` (≥ the core count in
  * every graft session), so the old dynamic probe was a no-op there
  * too, minus the wasted execution.
  *
  * Use it only where the per-row work measurably dominates the
  * exchange (md5 window digests, gram-string construction): for cheap
  * transforms the added shuffle is a net loss, and above a pushdown-
  * consuming scan it would block PushedFilters — apply it after the
  * narrow column select, never around a filtered scan. */
object Par {
  def spread(df: DataFrame): DataFrame = {
    // streaming frames cannot be probed (and micro-batches are planned
    // per epoch anyway) — pass them through untouched
    if (df.isStreaming) return df
    val cores = df.sparkSession.sparkContext.defaultParallelism
    plannedWidth(df.queryExecution.sparkPlan) match {
      case Some(n) if n < cores => df.repartition(cores)
      case _ => df
    }
  }

  /** Planned partition count of a narrow (shuffle-free) plan, or None
    * when the plan shuffles or holds a leaf we cannot size without
    * executing. Pure plan inspection: file-split/partition planning
    * runs, but no Spark job. */
  private def plannedWidth(plan: SparkPlan): Option[Int] = {
    if (plan.exists(_.isInstanceOf[ShuffleExchangeLike])) return None
    val widths = plan.collectLeaves().map {
      case f: FileSourceScanExec => Some(f.inputRDD.getNumPartitions)
      case r: RDDScanExec => Some(r.inputRDD.getNumPartitions)
      case e: ExternalRDDScanExec[_] => Some(e.rdd.getNumPartitions)
      case _: LocalTableScanExec => Some(1)
      case b: BatchScanExec => Some(math.max(1, b.inputRDD.getNumPartitions))
      case _ => None // unknown leaf: treat as wide rather than risk
                     // adding an exchange that is not needed
    }
    if (widths.exists(_.isEmpty)) None else Some(widths.flatten.sum)
  }
}

package graft.util

import org.apache.spark.sql.DataFrame

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
  * Use it only where the per-row work measurably dominates the
  * exchange (md5 window digests, gram-string construction): for cheap
  * transforms the added shuffle is a net loss, and above a pushdown-
  * consuming scan it would block PushedFilters — apply it after the
  * narrow column select, never around a filtered scan. */
object Par {
  def spread(df: DataFrame): DataFrame = {
    // streaming frames cannot be probed via .rdd (and micro-batches
    // are planned per epoch anyway) — pass them through untouched
    if (df.isStreaming) return df
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }
}

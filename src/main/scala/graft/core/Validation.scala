package graft.core

import org.apache.spark.sql.DataFrame

/** Full-dataset validation (A4 — the ValidateDatasetNode analog,
  * reference complex-dag-mor.yaml:50-53, `validate_full_data: true`):
  * multiset equality via exceptAll in both directions, the set-op
  * formulation that distributes (no driver-side collection).
  */
object Validation {

  /** Multiset equality of two DataFrames over `cols` (all shared
    * columns when empty). An EMPTY comparison column set is refused:
    * zero-column exceptAll degenerates to row-count equality, which
    * would "validate" two unrelated datasets of the same size. */
  def datasetEquals(expected: DataFrame, actual: DataFrame,
      cols: Seq[String] = Nil): Boolean = {
    val shared = if (cols.nonEmpty) cols
      else expected.columns.toSeq.intersect(actual.columns.toSeq)
    require(shared.nonEmpty,
      "datasetEquals over zero shared columns would compare only row " +
      s"counts — expected has [${expected.columns.mkString(",")}], " +
      s"actual has [${actual.columns.mkString(",")}]")
    val e = expected.select(shared.map(expected.col): _*)
    val a = actual.select(shared.map(actual.col): _*)
    e.exceptAll(a).isEmpty && a.exceptAll(e).isEmpty
  }

  /** The A3 uniqueness invariant: rows whose key appears more than
    * once in the snapshot (expected empty after any upsert workload —
    * deltastreamer-hive-sync-presto.yaml:66-67). */
  def duplicateKeys(t: GraftTable): DataFrame = {
    import org.apache.spark.sql.functions._
    // identity = (partition VALUE, key): derived-partition tables
    // group on the derived value, not the raw source column
    val (df, idCols) = t.withIdCols(t.read())
    df.groupBy(idCols.map(col): _*).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
  }

  /** Table state vs accumulated expected input: the full DAG-node
    * check — content equality on data columns plus key uniqueness.
    * EVERY expected column must exist in the table: silently narrowing
    * to the intersection would let a table that never materialized a
    * column "validate" against input that has it. The snapshot is
    * computed once and persisted — it feeds five actions (two
    * exceptAll probes, the dup check, plus planning), and for MOR each
    * un-cached read would repeat the full realtime merge. */
  def validateAgainstInput(t: GraftTable, expectedInput: DataFrame): Boolean = {
    import org.apache.spark.sql.functions._
    val snapshot = t.read().persist()
    try {
      val missing = expectedInput.columns.toSeq
        .filterNot(snapshot.columns.contains)
      if (missing.nonEmpty) return false
      val (df, idCols) = t.withIdCols(snapshot)
      val noDups = df.groupBy(idCols.map(col): _*)
        .agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1).isEmpty
      datasetEquals(expectedInput, snapshot, expectedInput.columns.toSeq) &&
        noDups
    } finally { snapshot.unpersist(); () }
  }
}

package graft.sql

import graft.core.{DataFileMeta, StatsPruner}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, Or => COr, _}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.FileScanBuilder
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** File-skipping ScanBuilder for the DSv2 catalog read path: pushed
  * filters select the live-file SUBSET via commit-log column stats and
  * the partition value BEFORE Spark's parquet scan exists, so a
  * catalog-qualified `SELECT ... WHERE` skips whole files the way the
  * `readWhereBetween` API does — Delta/Hudi-style data skipping,
  * reachable from plain SQL. At 100 TB this is the difference between
  * listing O(table) and O(matching) files in the scan.
  *
  * The surviving files feed Spark's own [[ParquetTable]] scan builder,
  * which re-receives the filters (parquet row-group / page pruning and
  * `PushedFilters` in explain) and the required columns (projection
  * pushdown). Every filter is ALSO returned as post-scan, so skipping
  * is conservative-only — an unprunable expression simply keeps all
  * files and can never change results. */
final class GraftFileSkippingScanBuilder(
    spark: SparkSession,
    tableName: String,
    root: String,
    files: Seq[DataFileMeta],
    schema: StructType,
    partitionField: Option[String],
    options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownCatalystFilters
  with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private var filters: Seq[Expression] = Nil
  private var required: Option[StructType] = None
  private var countPushed = false

  override def pushFilters(f: Seq[Expression]): Seq[Expression] = {
    filters = f
    f // all filters stay post-scan; this builder only narrows IO
  }

  // file-level skipping is invisible pushdown (results identical);
  // the parquet Scan built below reports its own pushed filters
  override def pushedFilters: Array[V2Predicate] = Array.empty

  override def pruneColumns(s: StructType): Unit = { required = Some(s) }

  /** Unfiltered, ungrouped COUNT(*) answers from commit-log metadata —
    * no file is opened (the Hudi/Delta metadata-count optimization; at
    * 100 TB the difference between an instant answer and a full scan).
    * Guarded: any pushed filter, grouping, other aggregate, or a file
    * with an unharvested row count (recorded 0) falls back to the real
    * scan — pushdown must never be able to change a result. */
  private def canPushCount(agg: Aggregation): Boolean =
    filters.isEmpty && agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0).isInstanceOf[CountStar] &&
      files.forall(_.rows > 0)

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    canPushCount(agg)

  override def pushAggregation(agg: Aggregation): Boolean = {
    countPushed = canPushCount(agg)
    countPushed
  }

  override def build(): Scan = {
    if (countPushed) {
      val total = files.map(_.rows).sum
      return new LocalScan {
        override def rows(): Array[InternalRow] = Array(InternalRow(total))
        override def readSchema(): StructType =
          StructType(Seq(StructField("count(*)", LongType, nullable = false)))
        override def description(): String =
          s"GraftMetadataCount($tableName, rows=$total, files=${files.size})"
      }
    }
    val surviving = files.filter(f => filters.forall(mayMatch(f, _)))
    val pt = ParquetTable(tableName, spark, options,
      surviving.map(f => s"$root/${f.path}"), Some(schema),
      classOf[ParquetFileFormat])
    val sb = pt.newScanBuilder(options).asInstanceOf[FileScanBuilder]
    sb.pushFilters(filters)
    required.foreach(sb.pruneColumns)
    sb.build()
  }

  // ---- conservative stats evaluation --------------------------------

  private def dtOf(attr: String): Option[DataType] =
    schema.fields.find(_.name == attr).map(_.dataType)

  /** Literal rendered the way stats were stored (`cast(col as string)`
    * of the value); None = not comparable → never prune on it. */
  private def litStr(v: Any): Option[String] = v match {
    case null => None
    case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
    case b: Boolean => Some(b.toString)
    case n @ (_: Byte | _: Short | _: Int | _: Long | _: Float | _: Double) =>
      Some(n.toString)
    case d: Decimal => Some(d.toString)
    case d: java.math.BigDecimal => Some(d.toString)
    case _ => None // timestamps / dates / binary: stored form differs
  }

  private def mayMatch(f: DataFileMeta, e: Expression): Boolean = e match {
    case CAnd(l, r) => mayMatch(f, l) && mayMatch(f, r)
    case COr(l, r) => mayMatch(f, l) || mayMatch(f, r)
    case EqualTo(a: AttributeReference, Literal(v, _)) => eqMay(f, a.name, v)
    case EqualTo(Literal(v, _), a: AttributeReference) => eqMay(f, a.name, v)
    case GreaterThan(a: AttributeReference, Literal(v, _)) =>
      cmpMay(f, a.name, litStr(v), None)
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) =>
      cmpMay(f, a.name, litStr(v), None)
    case LessThan(a: AttributeReference, Literal(v, _)) =>
      cmpMay(f, a.name, None, litStr(v))
    case LessThanOrEqual(a: AttributeReference, Literal(v, _)) =>
      cmpMay(f, a.name, None, litStr(v))
    case GreaterThan(Literal(v, _), a: AttributeReference) =>
      cmpMay(f, a.name, None, litStr(v))
    case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) =>
      cmpMay(f, a.name, None, litStr(v))
    case LessThan(Literal(v, _), a: AttributeReference) =>
      cmpMay(f, a.name, litStr(v), None)
    case LessThanOrEqual(Literal(v, _), a: AttributeReference) =>
      cmpMay(f, a.name, litStr(v), None)
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.isEmpty || vs.exists { case Literal(v, _) => eqMay(f, a.name, v) }
    case InSet(a: AttributeReference, vs) =>
      vs.isEmpty || vs.exists(v => eqMay(f, a.name, v))
    case _ => true // unknown shape: keep the file
  }

  private def eqMay(f: DataFileMeta, attr: String, v: Any): Boolean =
    if (partitionField.contains(attr)) litStr(v).forall(_ == f.partition)
    else { val s = litStr(v); cmpMay(f, attr, s, s) }

  private def cmpMay(f: DataFileMeta, attr: String,
      lo: Option[String], hi: Option[String]): Boolean =
    if (partitionField.contains(attr)) true // only equality prunes partitions
    else if (lo.isEmpty && hi.isEmpty) true
    else dtOf(attr).forall(dt => StatsPruner.mayContain(dt, f.stats.get(attr), lo, hi))
}

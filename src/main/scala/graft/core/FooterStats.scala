package graft.core

import java.math.{BigDecimal => JBigDecimal, BigInteger}
import java.nio.file.Path
import java.time.LocalDate
import java.util.concurrent.{Callable, Executors}

import scala.collection.JavaConverters._
import scala.util.control.NonFatal

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.types._

/** Per-file stats harvested from parquet FOOTERS instead of a re-scan.
  *
  * The write path needs (rows, min, max, nullCount) per staged file for
  * the commit log. Reading that back with a Spark job is O(rows-written)
  * a second time — column-pruned, but still a full pass over the stats
  * columns. Parquet already computed exactly these numbers while
  * writing: every row group's column chunk carries min/max/null-count
  * statistics in the footer. Harvesting there is O(files) metadata
  * reads with zero data pages touched — the difference between a
  * per-commit Spark job and a few milliseconds of driver I/O, and the
  * reason a 1000-executor streaming sink can commit every few seconds
  * (the Hudi writer harvests footers the same way).
  *
  * String representations are kept IDENTICAL to the scan harvest
  * (`min(col).cast(StringType)`) so the commit-log bytes don't depend
  * on which path ran: numerics via Java `toString`, decimals via
  * `toPlainString` at the declared scale, dates as ISO `LocalDate`.
  * Types whose footer→cast-string mapping is not bit-reliable
  * (timestamps: session-zone formatting; nested/binary: no stats)
  * make [[harvest]] return None and the caller falls back to the scan.
  * Conservative-direction caveats are acceptable by construction:
  * parquet may TRUNCATE very long string min/max (still valid bounds —
  * the pruner only needs bounds) and a missing/unknown statistic
  * triggers the fallback, never a wrong value.
  */
object FooterStats {

  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | StringType | DateType | BooleanType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Harvest `(rows, colStats)` for every file, keyed by the LAST THREE
    * path segments (`_part=…/_bucket=…/part-….parquet` — the same key
    * the staging move loop builds). None → fall back to the scan. */
  def harvest(files: Seq[Path], statCols: Seq[String], schema: StructType,
      conf: Configuration): Option[Map[String, (Long, Map[String, ColStat])]] = {
    val types = statCols.map(c => c -> schema(c).dataType).toMap
    if (!types.valuesIterator.forall(supported)) return None
    if (files.isEmpty) return Some(Map.empty)
    val pool = Executors.newFixedThreadPool(math.min(16, files.size))
    try {
      val tasks = files.map { p =>
        new Callable[Option[(String, (Long, Map[String, ColStat]))]] {
          def call() = fileStats(p, statCols, types, conf)
        }
      }
      val results = pool.invokeAll(tasks.asJava).asScala.map(_.get())
      if (results.exists(_.isEmpty)) None else Some(results.flatten.toMap)
    } finally pool.shutdown()
  }

  private def fileStats(p: Path, statCols: Seq[String],
      types: Map[String, DataType], conf: Configuration)
      : Option[(String, (Long, Map[String, ColStat]))] =
    try {
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(p.toUri), conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        val rows = blocks.map(_.getRowCount).sum
        val perCol = statCols.map { c =>
          val dt = types(c)
          var minS: String = null
          var maxS: String = null
          var nulls = 0L
          for (b <- blocks) {
            val chunk = b.getColumns.asScala
              .find(_.getPath.toDotString == c)
              .getOrElse(return None) // column absent from footer → scan
            val st = chunk.getStatistics
            if (st == null || st.isNumNullsSet == false) return None
            nulls += st.getNumNulls
            if (st.hasNonNullValue) {
              val mn = convert(dt, st.genericGetMin.asInstanceOf[AnyRef])
                .getOrElse(return None)
              val mx = convert(dt, st.genericGetMax.asInstanceOf[AnyRef])
                .getOrElse(return None)
              if (minS == null || StatsPruner.compare(dt, mn, minS) < 0) minS = mn
              if (maxS == null || StatsPruner.compare(dt, mx, maxS) > 0) maxS = mx
            }
          }
          c -> ColStat(Option(minS).getOrElse(""), Option(maxS).getOrElse(""), nulls)
        }.toMap
        val key = {
          val segs = p.toString.split("/")
          segs.takeRight(3).mkString("/")
        }
        Some(key -> (rows, perCol))
      } finally reader.close()
    } catch { case NonFatal(_) => None }

  /** Footer value → the exact string `cast(col, StringType)` yields. */
  private def convert(dt: DataType, v: AnyRef): Option[String] = (dt, v) match {
    case (ByteType | ShortType | IntegerType | LongType, n: Number) =>
      Some(n.toString)
    case (FloatType, f: java.lang.Float) =>
      if (f.isNaN) None else Some(f.toString)
    case (DoubleType, d: java.lang.Double) =>
      if (d.isNaN) None else Some(d.toString)
    case (BooleanType, b: java.lang.Boolean) => Some(b.toString)
    case (StringType, b: Binary) => Some(b.toStringUsingUTF8)
    case (DateType, i: java.lang.Integer) =>
      Some(LocalDate.ofEpochDay(i.toLong).toString)
    case (d: DecimalType, n: java.lang.Integer) =>
      Some(new JBigDecimal(BigInteger.valueOf(n.toLong), d.scale).toPlainString)
    case (d: DecimalType, n: java.lang.Long) =>
      Some(new JBigDecimal(BigInteger.valueOf(n), d.scale).toPlainString)
    case (d: DecimalType, b: Binary) =>
      Some(new JBigDecimal(new BigInteger(b.getBytes), d.scale).toPlainString)
    case _ => None
  }
}

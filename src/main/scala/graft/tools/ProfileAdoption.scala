package graft.tools

import graft.core.{GraftTable, TableConfig}
import graft.interop.XTableSync
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Scratch measurement for IN-PLACE foreign-table adoption at a
  * realistic file count (not part of the driver contract): build a
  * Delta table and an Iceberg table with `nFiles` live data files,
  * adopt each, and verify the cost is METADATA-ONLY — wall time
  * O(files), zero data rewrite (source file mtimes and sizes
  * unchanged; the adopted layout is hard links).
  * Usage: runMain graft.tools.ProfileAdoption [nFiles=5000]
  */
object ProfileAdoption {
  def main(args: Array[String]): Unit = {
    val nFiles = if (args.length > 0) args(0).toInt else 5000
    val spark = graft.Session.local(32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[adoption] $label: $s%.2f s")
      (r, s)
    }
    val mapper = graft.core.CommitLog.mapper

    // ---- Delta: nFiles parquet + a one-version log listing them ----
    val droot = graft.util.TempDirs.create("graft-adopt-d-").toString
    spark.range(nFiles.toLong * 4)
      .select(col("id"), (col("id") % 100).as("ts"),
        (col("id") * 1.5).as("score"))
      .repartition(nFiles)
      .write.parquet(s"$droot/data")
    val dataFiles = graft.util.Fs.list(Paths.get(droot, "data"))(_
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq)
      .sortBy(_.toString)
    println(s"[adoption] delta source files: ${dataFiles.size}")
    val schema = Seq((1L, 1L, 0.0)).toDF("id", "ts", "score").schema.json
    val meta = mapper.writeValueAsString(Map(
      "metaData" -> Map("id" -> "0",
        "format" -> Map("provider" -> "parquet"),
        "schemaString" -> schema, "partitionColumns" -> Seq.empty)))
    val adds = dataFiles.map(p =>
      s"""{"add":{"path":"data/${p.getFileName}","partitionValues":{},""" +
      s""""size":${Files.size(p)},"modificationTime":1,"dataChange":true}}""")
    Files.createDirectories(Paths.get(droot, "_delta_log"))
    Files.write(Paths.get(droot, "_delta_log", f"${0L}%020d.json"),
      (Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        meta) ++ adds).mkString("", "\n", "\n").getBytes("UTF-8"))
    val sample = dataFiles.take(50)
    val mtimesBefore = sample.map(p => Files.getLastModifiedTime(p))
    val (dt, _) = time(s"adoptDelta ($nFiles files)") {
      XTableSync.adoptDelta(spark, droot, TableConfig(name = "adoptd",
        keyField = "id", orderingField = "ts", numBuckets = 4))
    }
    require(sample.map(p => Files.getLastModifiedTime(p)) == mtimesBefore,
      "adoption rewrote source data files")
    require(dt.log.liveFiles().size == dataFiles.size)
    println(s"[adoption] delta adopted rows=${dt.metadataRowCount}")

    // ---- Iceberg: bootstrap + sync builds a real manifest chain ----
    val iroot = graft.util.TempDirs.create("graft-adopt-i-").toString
    spark.range(nFiles.toLong * 4)
      .select(col("id"), (col("id") % 100).as("ts"),
        (col("id") * 1.5).as("score"))
      .repartition(nFiles)
      .write.parquet(s"$iroot/raw")
    locally {
      val t0 = GraftTable.create(spark, iroot, TableConfig(name = "ice",
        keyField = "id", orderingField = "ts", numBuckets = 4))
      t0.bootstrapFrom(s"$iroot/raw")
      XTableSync.syncIceberg(t0)
      graft.util.Fs.walkSeq(Paths.get(iroot, graft.core.CommitLog.Dir))
        .reverse.foreach(Files.deleteIfExists(_))
    }
    require(!GraftTable.exists(iroot))
    val (it, _) = time(s"adoptIceberg ($nFiles files)") {
      XTableSync.adoptIceberg(spark, iroot, TableConfig(name = "adopti",
        keyField = "id", orderingField = "ts", numBuckets = 4))
    }
    val irawFiles = graft.util.Fs.list(Paths.get(iroot, "raw"))(_
      .count(_.getFileName.toString.endsWith(".parquet")))
    require(it.log.liveFiles().size == irawFiles)
    println(s"[adoption] iceberg adopted rows=${it.metadataRowCount}")
    spark.stop()
  }
}

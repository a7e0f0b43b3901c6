package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star extension): images / audio /
  * video ride along as opaque `binary` columns with typed metadata
  * structs; decode / feature-extract run per partition in batches.
  *
  * The actual codec calls are STUBBED (no image/audio libraries in this
  * environment — see `FakeCodec`): the Spark-side contract — schema,
  * batch iteration shape, partition sizing, null/corrupt handling — is
  * real and tested, and a deployment swaps `FakeCodec` for a JNI/JavaCV
  * binding without touching the pipeline.
  */
object Multimodal {

  val ImageMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType),
    StructField("corrupt", BooleanType)))

  /** Deterministic stand-in decoder: parses a tiny fake header
    * (`[format:1][width:2][height:2]` big-endian) that the test fixture
    * writer emits. A real deployment replaces exactly this object. */
  object FakeCodec {
    def imageMeta(bytes: Array[Byte]): (String, Int, Int, Boolean) = {
      if (bytes == null || bytes.length < 5) ("unknown", 0, 0, true)
      else {
        val fmt = bytes(0) match {
          case 1 => "png"; case 2 => "jpeg"; case 3 => "webp"; case _ => "unknown"
        }
        val w = ((bytes(1) & 0xff) << 8) | (bytes(2) & 0xff)
        val h = ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
        (fmt, w, h, fmt == "unknown")
      }
    }

    /** Stub "resize": deterministic byte fold standing in for pixel
      * work, so tests can assert the batch plumbing end-to-end. */
    def thumbnailChecksum(bytes: Array[Byte], maxSide: Int): Long = {
      var h = maxSide.toLong
      var i = 0
      while (i < bytes.length) { h = h * 31 + (bytes(i) & 0xff); i += 1 }
      h
    }
  }

  /** Attach decoded image metadata to a binary column. Runs as
    * mapPartitions (one JVM call per batch of rows, the Scala analog of
    * a pandas-batch UDF): per-row codec dispatch amortizes across the
    * partition, stays off the driver, and preserves partitioning. */
  def withImageMeta(df: DataFrame, binCol: String, outCol: String = "image_meta"): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField(outCol, ImageMetaSchema))
    val binIdx = inSchema.fieldIndex(binCol)
    // Row-based mapPartitions keeps the stub readable; an InternalRow
    // path is an optimization a real codec binding would own.
    val rowRdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        val (fmt, w, h, corrupt) = FakeCodec.imageMeta(bytes)
        val n = if (bytes == null) 0L else bytes.length.toLong
        Row.fromSeq(r.toSeq :+ Row(fmt, w, h, n, corrupt))
      }
    }
    spark.createDataFrame(rowRdd, outSchema)
  }

  /** Stubbed resize/feature pass over a binary column → checksum long
    * (the real version returns resized bytes; the *shape* — binary in,
    * deterministic value out, batch execution — is what's under test). */
  def withThumbnailChecksum(df: DataFrame, binCol: String, maxSide: Int,
      outCol: String = "thumb_checksum"): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField(outCol, LongType))
    val binIdx = inSchema.fieldIndex(binCol)
    val rowRdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(binIdx)) Array.empty[Byte] else r.getAs[Array[Byte]](binIdx)
        Row.fromSeq(r.toSeq :+ FakeCodec.thumbnailChecksum(bytes, maxSide))
      }
    }
    spark.createDataFrame(rowRdd, outSchema)
  }

  /** Frame-sampling stub for video columns: emit one row per sampled
    * frame index (explode shape without decoding). Real codec replaces
    * the index math with keyframe positions. */
  def sampleFrameIndexes(df: DataFrame, binCol: String, everyNBytes: Int): DataFrame =
    df.withColumn("frame_index",
      explode(sequence(lit(0),
        greatest(lit(0), (octet_length(col(binCol)) / everyNBytes).cast("int")))))
}

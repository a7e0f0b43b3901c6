package graft.operators

import graft.functions.GraftExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Multimodal column plumbing (north-star extension): images / audio /
  * video ride along as opaque `binary` columns with typed metadata
  * structs.
  *
  * The decode steps are NATIVE Catalyst expressions over `BinaryType`
  * ([[graft.functions.ImageMetaExpression]] /
  * [[graft.functions.ThumbnailChecksumExpression]]) — round 1 used a
  * `df.rdd` Row round-trip here, which dropped whole-stage codegen and
  * columnar batches for every downstream operator; as expressions the
  * decode composes with pushdown, pruning and partitioning like any
  * built-in function.
  *
  * The actual codec calls are STUBBED (no image/audio libraries in this
  * environment — see [[graft.functions.FakeCodec]]): the Spark-side
  * contract — schema, null/corrupt handling, per-row dispatch inside
  * the codegen'd plan — is real and tested, and a deployment swaps
  * `FakeCodec` for a JNI/JavaCV binding without touching the pipeline.
  */
object Multimodal {

  val ImageMetaSchema: StructType = graft.functions.ImageMetaExpression.schema

  /** The pluggable stand-in codec (kept addressable here for callers
    * and tests; lives next to the expressions that wrap it). */
  val FakeCodec = graft.functions.FakeCodec

  /** Attach decoded image metadata to a binary column — stays inside
    * the codegen'd plan, no RDD boundary. */
  def withImageMeta(df: DataFrame, binCol: String, outCol: String = "image_meta"): DataFrame =
    df.withColumn(outCol, GraftExpressions.image_meta(col(binCol)))

  /** Stubbed resize/feature pass over a binary column → checksum long
    * (the real version returns resized bytes; the *shape* — binary in,
    * deterministic value out, in-plan execution — is what's under
    * test). */
  def withThumbnailChecksum(df: DataFrame, binCol: String, maxSide: Int,
      outCol: String = "thumb_checksum"): DataFrame =
    df.withColumn(outCol, GraftExpressions.thumbnail_checksum(col(binCol), maxSide))

  /** Frame-sampling stub for video columns: emit one row per sampled
    * frame index (explode shape without decoding). Real codec replaces
    * the index math with keyframe positions. */
  def sampleFrameIndexes(df: DataFrame, binCol: String, everyNBytes: Int): DataFrame =
    df.withColumn("frame_index",
      explode(sequence(lit(0),
        greatest(lit(0), (octet_length(col(binCol)) / everyNBytes).cast("int")))))
}

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

  /** BATCHED codec execution over a binary column — the Scala analog
    * of a `mapInPandas` inference stage: rows stream through each
    * partition in fixed-size batches, the codec is called ONCE per
    * batch (where a real deployment amortizes model setup / GPU
    * transfer), and outputs rejoin their ids positionally. Contract
    * enforced per call: one output per input, input order preserved;
    * an arity-violating codec fails the batch with an actionable
    * error instead of silently mis-assigning features.
    *
    * Plan shape: `mapPartitions` over the scan — NO shuffle, no
    * driver involvement, arbitrary partition counts; the typed
    * boundary costs the codegen fence exactly once around the codec
    * call (which is the dominant cost by assumption — otherwise use
    * the in-plan expression twin [[withByteHistogram]], spec-asserted
    * equal). Output: (idCol: long, features: array<float>). */
  def mapBinaryBatches(df: DataFrame, idCol: String, binCol: String,
      batchSize: Int,
      codec: Seq[Array[Byte]] => Seq[Array[Float]] =
        graft.functions.FakeCodec.embedBatch(_)): DataFrame = {
    require(batchSize > 0, s"batchSize $batchSize")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val outs = codec(batch.map(_._2))
          require(outs.length == batch.length,
            s"codec returned ${outs.length} outputs for ${batch.length} " +
              "inputs — batched codecs must emit exactly one output per " +
              "input, in order")
          batch.map(_._1).zip(outs)
        }
      }
      .toDF(idCol, "features")
  }

  /** The in-plan scalar twin of [[mapBinaryBatches]] with the default
    * codec: L1-normalized byte-value histogram as a native expression
    * (no typed boundary — stays in the scan's codegen stage). */
  def withByteHistogram(df: DataFrame, binCol: String, bins: Int = 16,
      outCol: String = "features"): DataFrame =
    df.withColumn(outCol, GraftExpressions.byte_histogram(col(binCol), bins))

  /** Binary near-dup pairs: byte-histogram features → exact cosine
    * pairs ([[Dedup.embeddingCosinePairs]]) — the multimodal column
    * riding the SAME dedup stack as text embeddings. Payloads differing
    * by small byte edits land near cosine 1; unrelated payloads
    * scatter. At scale swap the all-pairs verifier for
    * [[Similarity.lshCandidatePairs]] exactly as p5 → p15 does. */
  def binaryNearDupPairs(df: DataFrame, idCol: String, binCol: String,
      threshold: Double): DataFrame =
    Dedup.embeddingCosinePairs(
      withByteHistogram(df, binCol), idCol, "features", threshold)

  /** Interleaved multimodal document ASSEMBLY — the MMC4/LAION training
    * sample shape: text spans and binary assets merged per document
    * into one order-preserving sequence, plus per-doc modality stats.
    *
    * `entries` carries one row per sequence element, text or asset:
    * {{{
    *   (doc_id, pos INT, ord INT, kind STRING, entry STRING,
    *    pixels LONG nullable)
    * }}}
    * `pos` is the element's position in the document, `ord` breaks
    * same-position ties deterministically (convention: text 0,
    * image 1, audio 2 — an asset anchored at span p renders after the
    * span), `entry` is the element's rendered reference (the caller
    * decides the rendering: span text, asset id + dims, ...), `pixels`
    * feeds the image-mass stat (null for non-images).
    *
    * Scale shape: ONE doc_id shuffle. Each side (spans from the text
    * table, assets from the asset table) arrives as its own map-only
    * projection; the union groups by doc and the sequence + every stat
    * come out of the SAME aggregate — assets are never joined per span
    * (an assets⋈spans join would duplicate each asset across its
    * document's spans), and nothing is ever collected per partition
    * beyond one document's elements (a single doc's sequence must fit
    * in memory — the same per-key contract every collect_list
    * aggregation in the engine carries). */
  def assembleInterleaved(entries: DataFrame,
      docCol: String = "doc_id"): DataFrame =
    entries.groupBy(col(docCol))
      .agg(
        array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("ord"),
            col("entry")))),
          x => x.getField("entry")), "|").as("seq"),
        sum(when(col("kind") === "text", 1L).otherwise(0L)).as("n_spans"),
        sum(when(col("kind") === "image", 1L).otherwise(0L)).as("n_images"),
        sum(when(col("kind") === "audio", 1L).otherwise(0L)).as("n_audio"),
        sum(coalesce(col("pixels"), lit(0L))).as("total_pixels"))
}

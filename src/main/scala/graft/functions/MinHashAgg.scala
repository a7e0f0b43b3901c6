package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Dataset-level MinHash sketch as a TypedImperativeAggregate: the
  * elementwise-min union of per-row minhash signatures. The resulting
  * 128-long array estimates Jaccard similarity BETWEEN WHOLE DATASETS
  * (corpus-vs-corpus contamination checks, dedup across snapshots) in
  * one pass — signatures of unions are mins of signatures, so the
  * aggregate is associative/commutative and merges map-side.
  *
  * This is the SURVEY.md §7 "custom TypedImperativeAggregate for
  * sketches" slot; buffer = primitive long array, serialized as
  * packed bytes.
  */
case class MinHashUnionAgg(
    child: Expression,
    numHashes: Int = 128,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private lazy val (as, bs) = HashFamilies.affine(numHashes)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_union"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  /** Input: array<long> of shingle hashes for one row (document). */
  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hs = v.asInstanceOf[ArrayData].toLongArray()
      var j = 0
      while (j < numHashes) {
        val a = as(j)
        val b = bs(j)
        var m = buf(j)
        var i = 0
        while (i < hs.length) {
          val h = a * hs(i) + b
          if (h < m) m = h
          i += 1
        }
        buf(j) = m
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numHashes) {
      if (other(j) < buf(j)) buf(j) = other(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(numHashes * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashUnionAgg =
    copy(child = newChildren.head)
}

object MinHashUnionAgg {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Aggregate a shingle-hash array column into a dataset signature. */
  def minhash_union(shingleHashes: Column, numHashes: Int = 128): Column =
    ColumnBridge.column(
      MinHashUnionAgg(ColumnBridge.expression(shingleHashes), numHashes)
        .toAggregateExpression())

  /** Estimated Jaccard between two dataset signatures: fraction of
    * agreeing minhash slots. */
  def estimatedJaccard(sigA: Seq[Long], sigB: Seq[Long]): Double =
    sigA.zip(sigB).count { case (a, b) => a == b }.toDouble / sigA.size
}

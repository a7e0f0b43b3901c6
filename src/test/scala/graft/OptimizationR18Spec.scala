package graft

import graft.operators.{Bpe, Pq}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Optimization-round 18 invariants: every fast path must return
  * bit-identical results to the path it replaces. */
class OptimizationR18Spec extends AnyFunSuite {

  private lazy val spark = Session.local(4)
  import spark.implicits._

  test("bpe mergeStats: driver fast path == distributed rounds, exactly") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ate the rat"),
      (3L, "low lower lowest slow slowest"),
      (4L, "aaa aa aaaa a"), // overlapping same-symbol merges
      (5L, "1234 !!!"), // no [a-z]+ token at all
      (6L, "x") // single-char word, no pairs
    ).toDF("doc_id", "text")
    def run(): Array[(Int, String, String, Long)] =
      Bpe.mergeStats(docs, "text", 12)
        .orderBy("merge_rank")
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val fast = run()
    spark.conf.set("spark.graft.bpe.driverVocabCap", "0") // force distributed
    val slow = try run()
    finally spark.conf.unset("spark.graft.bpe.driverVocabCap")
    assert(fast.nonEmpty)
    assert(fast.toSeq == slow.toSeq)
  }

  test("bpe mergeStats: driver path stops early when pairs run dry") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    // single-char words have no pairs at all: zero merges, not a crash
    assert(Bpe.mergeStats(docs, "text", 5).count() === 0L)
  }

  test("pq lloyd fixed-point shortcut: lossy codebooks unchanged by the early exit") {
    // k < distinct points forces real Lloyd rounds through the
    // convergence check; the clustered fixture converges well before
    // the iteration cap, and the means must equal the full-iteration
    // fixed point (bit-exact: once an iteration reproduces its input,
    // every further iteration is the identity).
    val embs = (0 until 64).map { i =>
      val c = i % 4
      (i.toLong, Array.tabulate(8)(j =>
        c * 10.0 + (if (j == c * 2) 1.0 else 0.0) + (i / 4) * 1e-9f))
    }.toDF("vec_id", "embedding")
    val few = Pq.train(embs, "vec_id", "embedding", m = 2, codesPerSub = 4,
      iterations = 8)
    val more = Pq.train(embs, "vec_id", "embedding", m = 2, codesPerSub = 4,
      iterations = 64)
    assert(few.codes.length == more.codes.length)
    few.codes.zip(more.codes).foreach { case (a, b) =>
      a.zip(b).foreach { case (ca, cb) =>
        assert(java.util.Arrays.equals(ca, cb))
      }
    }
  }
}

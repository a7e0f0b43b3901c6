package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BPE pair-merge statistics (tokenizer training, Sennrich '16): the
  * iterative most-frequent-adjacent-pair loop behind byte-pair
  * encoding, in the batched shuffle-per-round shape.
  *
  * Scale design (the reason this survives 100 TB): the CORPUS is
  * touched exactly once — one word-histogram shuffle with map-side
  * combine. Every merge round after that runs on the DISTINCT-WORD
  * relation (bounded by vocabulary, orders of magnitude smaller than
  * the corpus and independent of corpus growth): one pair-count
  * shuffle + a 1-row argmax collect per round, then a narrow
  * per-word merge application. Nothing corpus-sized is ever collected
  * or reshuffled, and round cost is O(vocab), not O(corpus).
  *
  * Mechanics: a word's segmentation is a DOUBLE-space-joined symbol
  * string with double-space sentinels (`"  h  i  "`). Applying merge
  * (l, r) is then `replace(s, ' l  r ', ' lr ')` — each match consumes
  * one space from each neighboring separator, so CONSECUTIVE pairs
  * still match (separators never collapse) while substring false
  * positives can't (symbol boundaries require the full separator).
  * Left-to-right non-overlapping `replace` is exactly greedy BPE merge
  * order. Symbols are `[a-z]+` (the tokenizer keeps lowercase words),
  * so merge literals never need escaping.
  *
  * Ties break deterministically: highest count, then (left, right)
  * lexicographic — the DuckDB oracle (p26) states the same order.
  */
object Bpe {

  /** The first `numMerges` BPE merges over `textCol`, as
    * (merge_rank, left_sym, right_sym, pair_count). Stops early if the
    * corpus runs out of pairs.
    *
    * Two executions of the SAME algorithm (identical merge sequence
    * and counts — exact integer pair counts, ties by (count desc,
    * left, right), and lowercase-ASCII symbols order the same under
    * Java strings and UTF8String):
    *  - vocab ≤ `spark.graft.bpe.driverVocabCap` (default 2²⁰): the
    *    word histogram — already the bounded distinct-word relation,
    *    the same O(vocab) driver move as the PQ training sample —
    *    collects once and the merge rounds run driver-side. Each
    *    distributed round was one shuffle + a 1-row collect whose cost
    *    is pure job overhead at vocab scale (measured ~0.3 s/round on
    *    a 31-word fixture vocabulary — the rounds were 8× the corpus
    *    pass).
    *  - larger vocabularies keep the round-per-shuffle shape: rounds
    *    stay O(vocab) distributed work and nothing unbounded ever
    *    reaches the driver (the 100 TB contract — Heaps-law vocabs can
    *    reach hundreds of millions of distinct words). */
  def mergeStats(docs: DataFrame, textCol: String,
      numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    // the one corpus-sized pass: word histogram, map-side combined
    val words = docs
      .select(explode(
        expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    // initial segmentation: chars, double-space joined + sentinels
    var seg = words.select(
      concat(lit("  "), expr("regexp_replace(w, '(.)', '$1  ')")).as("s"),
      col("freq")).persist()
    val cap = spark.conf.get("spark.graft.bpe.driverVocabCap",
      (1 << 20).toString).toInt
    // probe cardinality with a COUNT first and collect only when under
    // the cap: the previous limit(cap+1).collect() shipped up to 2²⁰+1
    // full segmentation strings to the driver even when the vocabulary
    // exceeded the cap and the distributed path was then taken anyway —
    // a large wasted transfer + driver memory spike at Heaps-law vocab
    // scale. The count reads the (persisted) histogram, no row moves.
    if (seg.limit(cap + 1).count() <= cap) {
      val head = seg.collect()
      seg.unpersist()
      return mergeStatsDriver(spark,
        head.map(r => (r.getString(0), r.getLong(1))), numMerges)
    }
    var prev: Option[DataFrame] = None
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    try {
      var round = 1
      var dry = false
      while (round <= numMerges && !dry) {
        // pair counts over the vocab relation — the round's ONE shuffle;
        // argmax is TakeOrdered (per-partition heads + 1-row driver merge)
        val top = seg
          .select(expr("split(trim(s), '  ')").as("a"), col("freq"))
          .select(explode(expr(
            """zip_with(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1),
              |  (l, r) -> struct(l, r))""".stripMargin)).as("p"),
            col("freq"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum("freq").as("cnt"))
          .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        // this round's aggregate materialized seg — the previous
        // round's cache is now dead weight
        prev.foreach(_.unpersist())
        prev = Some(seg)
        top.headOption match {
          case None => dry = true
          case Some(row) =>
            val (l, r, cnt) =
              (row.getString(0), row.getString(1), row.getLong(2))
            merges += ((round, l, r, cnt))
            seg = seg.withColumn("s",
              expr(s"replace(s, ' $l  $r ', ' $l$r ')")).persist()
            round += 1
        }
      }
    } finally {
      prev.foreach(_.unpersist())
      seg.unpersist()
      ()
    }
    mergesDf(spark, merges.result())
  }

  private def mergesDf(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(Int, String, String, Long)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("merge_rank", IntegerType, nullable = false),
      StructField("left_sym", StringType, nullable = false),
      StructField("right_sym", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        merges.map { case (i, l, r, c) => Row(i, l, r, c) }, 1),
      schema)
  }

  /** Unsigned byte-wise comparison of the UTF-8 encodings — the exact
    * ordering `UTF8String.compareTo` gives the distributed path's
    * `orderBy(l, r)`. Equal to `String.compareTo` for ASCII; differs
    * for supplementary-plane code points (UTF-16 surrogates sort below
    * some BMP chars, UTF-8 bytes never do). */
  private[graft] def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Driver-side merge rounds over the collected (segmentation, freq)
    * vocabulary — the bounded fast path of [[mergeStats]]. Greedy
    * left-to-right non-overlapping merge application, mirroring the
    * distributed path's `replace(s, ' l  r ', ' lr ')` exactly. */
  private def mergeStatsDriver(spark: org.apache.spark.sql.SparkSession,
      vocab: Array[(String, Long)], numMerges: Int): DataFrame = {
    // segmentation string "  h  i  " → symbol array ["h", "i"]
    var words: Array[(Array[String], Long)] = vocab.map { case (s, f) =>
      (s.trim.split("  "), f)
    }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var round = 1
    var dry = false
    while (round <= numMerges && !dry) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) dry = true
      else {
        // argmax with the distributed path's tie order: count desc,
        // then (left, right) ascending — compared on UTF-8 BYTES, the
        // ordering Spark's UTF8String uses, not Java's UTF-16 chars.
        // The two agree on ASCII (mergeStats' symbols are [a-z]+ by
        // construction) but diverge for supplementary-plane symbols;
        // byte order here keeps the driver path equal to the
        // distributed path for ANY symbol alphabet a future caller
        // feeds in, so the result can never depend on the vocab cap.
        var best: ((String, String), Long) = null
        counts.foreach { case (p, c) =>
          if (best == null || c > best._2 ||
              (c == best._2 && (utf8Cmp(p._1, best._1._1) < 0 ||
                (p._1 == best._1._1 && utf8Cmp(p._2, best._1._2) < 0)))) best = (p, c)
        }
        val ((l, r), cnt) = best
        merges += ((round, l, r, cnt))
        // greedy left-to-right non-overlapping application — a match
        // consumes both symbols, scanning resumes after the merged one
        words = words.map { case (syms, f) =>
          if (syms.length < 2) (syms, f)
          else {
            val out = scala.collection.mutable.ArrayBuffer[String]()
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                out += l + r; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, f)
          }
        }
        round += 1
      }
    }
    mergesDf(spark, merges.result())
  }

  /** ENCODE with a learned merge table: per-doc token counts after
    * applying `merges` in rank order — the apply half of the tokenizer
    * (training's [[mergeStats]] is the learn half).
    *
    * The merge table is a driver-side literal (vocabulary-sized — KB,
    * not data-sized), compiled into one codegen'd replace chain applied
    * per word: the corpus is touched in a single map-only pass, and the
    * only shuffle is the final per-doc count aggregation. Same
    * double-space segmentation mechanics as training, so greedy
    * left-to-right application reproduces the training segmentation
    * exactly. (With vocabulary-scale merge tables — tens of thousands —
    * the chain becomes an expression-depth problem; the move then is
    * encoding the DISTINCT-word relation once and joining back, paying
    * one bounded-vocab shuffle to amortize the chain over repeated
    * words.)
    *
    * Docs with NO `[a-z]+` token ("1234 !!!", empty text) are ABSENT
    * from the output, not emitted as n_tokens = 0 — the explode yields
    * no rows for them (same omission contract as knPerplexity's
    * bigram-less docs). Callers joining per-doc must left-join and
    * coalesce to 0. */
  def encodeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    // merge symbols are interpolated into a SQL expression string:
    // enforce the [a-z]+ invariant (which mergeStats always satisfies)
    // so a quote/metachar in a caller-supplied symbol fails loudly
    // instead of producing a corrupted expression
    merges.foreach { case (l, r) =>
      require(l.matches("[a-z]+") && r.matches("[a-z]+"),
        s"merge symbols must be lowercase ASCII words, got ('$l', '$r')")
    }
    val segExpr = merges.foldLeft(
      "concat('  ', regexp_replace(w, '(.)', '$1  '))") {
      case (acc, (l, r)) => s"replace($acc, ' $l  $r ', ' $l$r ')"
    }
    docs
      .select(col(idCol), explode(
        expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("w"))
      .select(col(idCol),
        expr(s"size(split(trim($segExpr), '  '))").cast("long").as("n"))
      .groupBy(idCol).agg(sum("n").as("n_tokens"))
  }
}

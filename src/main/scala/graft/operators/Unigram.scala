package graft.operators

import graft.functions.GraftExpressions.{unigram_encode_stat, unigram_segment}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (Kudo '18, the SentencePiece unigram model) —
  * the other major subword tokenizer family beside [[Bpe]]: where BPE
  * grows pieces bottom-up by greedy merges, the unigram model starts
  * from a LARGE substring-candidate vocabulary and segments each word
  * by Viterbi under per-piece costs.
  *
  * Scale design (the [[Bpe]] discipline): the CORPUS is touched exactly
  * once — the word-histogram shuffle. Candidate extraction, scoring,
  * Viterbi segmentation, and EM recounts all run on the DISTINCT-WORD
  * relation (bounded by vocabulary, independent of corpus growth); the
  * per-doc encode joins the distinct-word encodings back — one
  * bounded-vocab shuffle amortizing the DP over repeated words (the
  * amortization [[Bpe.encodeTokenCounts]]' scaladoc sketches, made
  * real). The vocabulary itself is driver-collected (top-K + alphabet
  * — KB, not data-sized) and ships as a Broadcast probed by the native
  * [[graft.functions.UnigramEncodeStat]] DP.
  *
  * Determinism discipline (oracle-exact, p75): piece counts are exact
  * longs; costs are integer micronats `⌊1e6·ln(total)⌋ − ⌊1e6·ln(cnt)⌋`
  * (per-value quantization BEFORE subtraction — the p57/p63 rule, so
  * both engines floor the same IEEE ln of the same integer); the DP
  * minimizes the single long `cost·1024 + n_pieces`, i.e. (cost,
  * n_pieces) lexicographically — no float ever crosses an engine
  * boundary.
  */
object Unigram {

  /** Words (`[a-z]+`, lowercased) with corpus frequencies — the one
    * corpus-sized pass. */
  private def wordHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(
        expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Substring-occurrence counts over the distinct-word relation:
    * every (start, len ≤ maxPieceLen) substring of every word, each
    * occurrence weighted by the word's corpus frequency — the standard
    * unigram-LM seed vocabulary statistic. */
  private def pieceCounts(words: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .select(explode(expr(
        s"""flatten(transform(sequence(1, length(w)),
           |  s -> transform(sequence(1, least($maxPieceLen, length(w) - s + 1)),
           |    l -> substring(w, s, l))))""".stripMargin)).as("piece"),
        col("freq"))
      .groupBy("piece").agg(sum("freq").cast("long").as("cnt"))

  /** The determinism-critical vocabulary-selection rule, shared by
    * every caller AND re-derived verbatim in the p75 oracle: top `k`
    * pieces by (count desc, piece asc) UNION every single character
    * (so any corpus word stays segmentable), with their exact
    * counts. */
  private def selectVocab(pc: DataFrame, k: Int): DataFrame =
    pc.orderBy(col("cnt").desc, col("piece").asc).limit(k)
      .union(pc.filter(length(col("piece")) === 1))
      .distinct()

  /** The frequency-seeded vocabulary ([[selectVocab]] over the raw
    * substring-occurrence counts). */
  def vocab(docs: DataFrame, textCol: String, topK: Int,
      maxPieceLen: Int = 4): DataFrame =
    selectVocab(pieceCounts(wordHistogram(docs, textCol), maxPieceLen), topK)

  /** Driver-side (piece → micronat cost) table from a (piece, cnt)
    * vocabulary: `⌊1e6·ln(total)⌋ − ⌊1e6·ln(cnt)⌋` per piece (the DP
    * itself folds each step into the `cost · 1024 + n_pieces`
    * encoding). */
  private def encTable(spark: SparkSession, voc: DataFrame,
      total: Long): Array[(String, Long)] = {
    def qln(x: Long): Long = math.floor(1e6 * math.log(x.toDouble)).toLong
    val qt = qln(total)
    voc.select("piece", "cnt").collect()
      .map(r => r.getString(0) -> (qt - qln(r.getLong(1))))
  }

  /** Per-doc encode statistics under the frequency-seeded vocabulary —
    * the oracle-gated surface (p75): (doc_id, n_words, n_pieces,
    * cost_micronats). Docs with no `[a-z]+` word are absent (the
    * [[Bpe.encodeTokenCounts]] omission contract). */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
      topK: Int, maxPieceLen: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    val words = wordHistogram(docs, textCol).persist()
    val bc =
      try {
        val pc = pieceCounts(words, maxPieceLen).persist()
        try {
          val totRow = pc.agg(sum("cnt")).first()
          require(!totRow.isNullAt(0),
            "encodeStats over an empty corpus: no [a-z]+ word exists to " +
            "seed a vocabulary from — check the upstream filter")
          spark.sparkContext.broadcast(
            encTable(spark, selectVocab(pc, topK), totRow.getLong(0)))
        } finally pc.unpersist()
      } catch { case t: Throwable => words.unpersist(); throw t }
    // materialize the bounded distinct-word DP EAGERLY (vocab-sized),
    // so the caches and the broadcast can be released before the lazy
    // result is returned — without this the corpus histogram would
    // recompute on every evaluation of the result
    // unsegmentable words (null enc — a word of ≥ 1024 letters, the
    // UnigramDp radix guard; single-char coverage makes any other cause
    // impossible) are DROPPED from the per-doc stats, matching the
    // oracle's inner join against its DP relation exactly
    val encoded =
      try words.select(col("w"),
          unigram_encode_stat(col("w"), bc, maxPieceLen).as("enc"))
        .filter(col("enc").isNotNull)
        .localCheckpoint()
      finally { words.unpersist(); bc.destroy(); () }
    docs
      .select(col(idCol).as("doc_id"), explode(
        expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("w"))
      .join(encoded, Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(expr("enc % 1024")).as("n_pieces"),
        sum(expr("enc DIV 1024")).as("cost_micronats"))
  }

  /** Per-doc encode statistics under a FROZEN learned vocabulary — the
    * streaming deployment shape, completing the tokenizer line's
    * streaming story: [[encodeStats]] learns from its corpus (two
    * corpus aggregations + an eager distinct-word DP — moves a
    * micro-batch cannot make), while this is ONE map-only projection
    * ([[graft.functions.UnigramDocStats]]) that runs unchanged on a
    * batch or a streaming frame. The distinct-word amortization
    * becomes a per-executor word memo.
    *
    * Broadcast lifecycle: the vocabulary broadcast is created ONCE at
    * plan-build time and deliberately NOT destroyed — under Structured
    * Streaming every micro-batch epoch re-executes the same plan
    * against it (destroying it after the first epoch, the
    * [[encodeStats]] eager pattern, would fail epoch 2). The caller
    * owns the returned frame's lifetime; the broadcast ages out with
    * the SparkContext.
    *
    * Word semantics match the join path exactly: unsegmentable words
    * (the radix guard, or a character the frozen vocabulary never saw
    * — possible here because NEW docs arrive after the freeze) are
    * excluded from all three statistics; docs with no countable word
    * are omitted. */
  def encodeStatsFrozen(docs: DataFrame, idCol: String, textCol: String,
      learned: DataFrame, maxPieceLen: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    val total = learned.agg(sum("cnt")).first()
    require(!total.isNullAt(0),
      "encodeStatsFrozen under an empty vocabulary — learn() first")
    val bc = spark.sparkContext.broadcast(
      encTable(spark, learned, total.getLong(0)))
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.GraftExpressions
          .unigram_doc_stats(col(textCol), bc, maxPieceLen).as("s"))
      .filter(col("s").isNotNull)
      .select(col("doc_id"), col("s.n_words").as("n_words"),
        col("s.n_pieces").as("n_pieces"),
        col("s.cost_micronats").as("cost_micronats"))
  }

  /** Hard-EM (Viterbi-EM) vocabulary refinement — deterministic
    * unigram training: seed with [[vocab]]'s occurrence counts, then
    * `emRounds` times (E) Viterbi-segment the distinct words under the
    * current costs and (M) recount pieces from the segmentation
    * (weighted by word frequency), keeping the top `vocabSize` by
    * (count desc, piece asc) plus every character (floor count 1 when
    * a char fell out of use — required for coverage, the SentencePiece
    * required-char rule). Each round's work is O(distinct words ×
    * maxPieceLen) DP on the bounded relation; the corpus is never
    * re-read. Returns the final (piece, cnt). */
  def learn(docs: DataFrame, textCol: String, vocabSize: Int,
      emRounds: Int = 2, maxPieceLen: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    val words = wordHistogram(docs, textCol).persist()
    try {
      var counts = pieceCounts(words, maxPieceLen)
      var round = 0
      while (round < emRounds) {
        val cur = counts.persist()
        val total = cur.agg(sum("cnt")).first().getLong(0)
        val bc = spark.sparkContext.broadcast(
          encTable(spark, selectVocab(cur, vocabSize), total))
        val recount = words
          .select(explode(unigram_segment(col("w"), bc, maxPieceLen))
            .as("piece"), col("freq"))
          .groupBy("piece").agg(sum("freq").cast("long").as("cnt"))
        // chars must stay segmentable even when unused this round
        val chars = cur.filter(length(col("piece")) === 1)
          .select(col("piece")).join(recount, Seq("piece"), "left_anti")
          .withColumn("cnt", lit(1L))
        // materialize (vocab-sized) before releasing what the round
        // read through — the parent cache AND the round's broadcast
        counts = recount.unionByName(chars).localCheckpoint()
        cur.unpersist()
        bc.destroy()
        round += 1
      }
      // emRounds == 0 returns the seed counts: materialize them too, so
      // the lazy result never recomputes the corpus histogram after the
      // finally below unpersists it
      if (round == 0) counts = counts.localCheckpoint()
      selectVocab(counts, vocabSize)
        .orderBy(col("cnt").desc, col("piece").asc)
    } finally { words.unpersist(); () }
  }

  /** Segment arbitrary words under a learned (piece, cnt) vocabulary —
    * the apply half for callers that need the pieces themselves. */
  def segmentWords(words: DataFrame, wordCol: String, learned: DataFrame,
      maxPieceLen: Int = 4): DataFrame = {
    val spark = words.sparkSession
    val total = learned.agg(sum("cnt")).first().getLong(0)
    val bc = spark.sparkContext.broadcast(encTable(spark, learned, total))
    words.withColumn("pieces",
      unigram_segment(col(wordCol), bc, maxPieceLen))
  }
}

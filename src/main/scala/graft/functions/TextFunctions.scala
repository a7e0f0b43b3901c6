package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the training-data pipeline operators, built
  * entirely from codegen'd Spark SQL functions (no UDFs): tokenization,
  * word shingles, quality ratios, SimHash, MinHash signatures.
  *
  * Everything here is a per-row expression — no shuffle, fully
  * parallel, safe at 100 TB. The only shuffles in the dedup pipeline
  * happen in the pair-generation joins (see operators.Dedup).
  */
object TextFunctions {

  /** Whitespace tokens (single-space split, matching the generators'
    * output and DuckDB's string_split for oracle parity). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word k-shingles. Short docs (< k words) yield their
    * whole token list as one shingle. Backed by the native
    * [[WordShingleStrings]] expression — value-identical to the HOF
    * formulation [[wordShinglesHof]], parity-pinned in Round19Spec
    * (the HOF tree evaluates interpreted per row; cf. the
    * [[ShingleHashes]] and TermBuckets lessons). */
  def wordShingles(text: Column, k: Int): Column =
    GraftExpressions.word_shingle_strings(text, k, distinct = true)

  /** All word k-shingle occurrences WITH multiplicity (no
    * `array_distinct`) — the term-frequency twin of [[wordShingles]]
    * for weighted similarity (TF cosine), where how often a shingle
    * repeats inside a document carries signal. Same short-doc rule:
    * < k words yield the whole token list as one shingle. */
  def wordShinglesAll(text: Column, k: Int): Column =
    GraftExpressions.word_shingle_strings(text, k, distinct = false)

  /** The HOF formulations, kept as the reference implementations the
    * native expression is parity-tested against. */
  def wordShinglesHof(text: Column, k: Int): Column =
    array_distinct(wordShinglesAllHof(text, k))

  def wordShinglesAllHof(text: Column, k: Int): Column = {
    val ws = tokens(text)
    transform(
      sequence(lit(1), greatest(lit(1), size(ws) - lit(k - 1))),
      i => concat_ws(" ", slice(ws, i, lit(k))))
  }

  /** Markup stripping for web-crawl text: drop tags, decode the six
    * ubiquitous HTML entities, collapse whitespace — the extraction
    * step between raw crawl HTML and every operator above. Entity
    * order matters: `&amp;` decodes LAST so `&amp;lt;` yields the
    * literal `&lt;`, not a double-decoded `<` (the classic pitfall).
    * Pure per-row regex/replace expressions (codegen'd, stream-safe);
    * the p65 oracle runs the same chain in DuckDB (RE2 vs Java regex
    * agree on these patterns; DuckDB needs the explicit 'g' flag). */
  def stripMarkup(text: Column): Column = {
    val untag = regexp_replace(text, "<[^>]*>", " ")
    val entities = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&") // &amp; last
    val decoded = entities.foldLeft(untag) { case (c, (k, v)) =>
      call_function("replace", c, lit(k), lit(v))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** 64-bit hashes of the distinct shingles — the fused native
    * [[ShingleHashes]] expression (the HOF tree it replaces is
    * interpreted per row; see the expression's doc). Values are
    * identical to `transform(wordShingles(text, k), xxhash64)`,
    * asserted by a parity test over the documents fixture. */
  def shingleHashes(text: Column, k: Int): Column =
    GraftExpressions.shingle_hashes(text, k)

  /** The HOF formulation, kept as the reference implementation the
    * native expression is parity-tested against. */
  def shingleHashesHof(text: Column, k: Int): Column =
    transform(wordShingles(text, k), g => xxhash64(g))

  // ---- MinHash --------------------------------------------------------

  /** MinHash signature (array<long> of length `numHashes`) over a
    * column of shingle hashes: signature[j] = min over shingles of
    * (a_j·h + b_j) (Broder '97). Backed by the native
    * [[MinHashSignature]] expression — the equivalent HOF composition
    * runs on the interpreted lambda path and measured ~400× slower. */
  def minhashSignature(shingleHashes: Column, numHashes: Int): Column =
    GraftExpressions.minhash_signature(shingleHashes, numHashes)

  /** LSH band keys from a minhash signature: `numBands` values, each a
    * hash of `rowsPerBand` consecutive signature entries (banded LSH,
    * same public scheme as Spark MLlib's MinHashLSH). Bands are
    * unrolled at plan-build time — every element offset is a literal,
    * and the band key hashes the signature LONGS directly (numeric
    * xxhash64, no string casts), so the whole thing codegens flat with
    * zero per-row allocation. Key equality still ⟺ slice equality
    * (hash collisions only ADD candidates, which the exact verify
    * filters), so results are identical to hashing any other faithful
    * encoding of the slice. */
  def lshBands(signature: Column, numBands: Int, rowsPerBand: Int): Column =
    array((0 until numBands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until rowsPerBand).map(r =>
          element_at(signature, b * rowsPerBand + r + 1)): _*).as("sig"))
    }: _*)

  // ---- SimHash --------------------------------------------------------

  /** 64-bit SimHash over token hashes (Charikar, "Similarity estimation
    * techniques from rounding algorithms", 2002): per bit, sum ±1 votes
    * across token hashes, set the bit when the vote is positive.
    * Token hashing stays a built-in (one xxhash64 per token); the
    * 64-bit vote loop is the native [[SimHash64]] expression. */
  def simhash64(text: Column): Column =
    GraftExpressions.simhash64(transform(split(text, " "), w => xxhash64(w)))

  /** Split a simhash into `numBands` `bandBits`-bit band values for
    * candidate bucketing (pigeonhole: hamming ≤ numBands-1 ⇒ at least
    * one identical band). Default 4×16 covers the 64-bit fingerprint;
    * the md5-parity 60-bit fingerprint bands as 4×15. */
  def simhashBands(sim: Column, numBands: Int = 4, bandBits: Int = 16): Column =
    array((0 until numBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(sim, b * bandBits).bitwiseAND((1L << bandBits) - 1).as("sig"))
    }: _*)

  /** Oracle-parity simhash: 60-bit fingerprint over word 5-shingles
    * with md5 as the feature hash (15 hex chars → 60-bit feature),
    * per-bit majority with ties set (`2·ones ≥ n`). Bit-identical in
    * Spark and DuckDB — the p4 gate injects THIS into
    * [[graft.operators.Dedup.simhashPairs]] so the green row certifies
    * the production operator; [[simhash64]] (native xxhash64 votes)
    * stays the fast default. Codegen'd built-ins only. */
  def simhashMd5_60(text: Column): Column = {
    val hs = transform(wordShingles(text, 5),
      g => conv(substring(md5(g), 1, 15), 16, 10).cast("long"))
    val n = size(hs)
    (0 until 60).map { b =>
      val ones = aggregate(hs, lit(0L),
        (acc, h) => acc + shiftright(h, b).bitwiseAND(1L))
      when(lit(2) * ones >= n, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  // ---- quality metrics ------------------------------------------------

  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "and", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this", "are")

  /** Token count / char count / avg token length / stopword ratio /
    * punctuation ratio — the standard cheap quality signals (cf. Gopher
    * rules, Rae et al. 2021). All exact-arithmetic for oracle parity:
    * integer counts, single double division at the end. */
  def qualityMetrics(text: Column): Seq[(String, Column)] = {
    val ws = tokens(text)
    val nTokens = size(ws)
    val nChars = length(text)
    val alphaSpace = length(regexp_replace(text, "[^a-z0-9 ]", ""))
    val stopArr = array(Stopwords.map(lit): _*)
    val nStop = size(filter(ws, w => array_contains(stopArr, w)))
    Seq(
      "n_tokens" -> nTokens,
      "n_chars" -> nChars,
      "avg_token_len" ->
        (length(regexp_replace(text, " ", "")).cast("double") / nTokens),
      "stopword_ratio" -> (nStop.cast("double") / nTokens),
      "punct_ratio" -> ((nChars - alphaSpace).cast("double") / nChars))
  }

  /** Repetition signals (the Gopher-style quality filters, Rae et al.
    * 2021 §A1.1): fraction of the doc taken by its most frequent word,
    * and fraction of duplicate word bigrams. Pure per-row HOF
    * expressions — no explode, no shuffle; at 100 TB these run inside
    * the scan like [[qualityMetrics]]. The mode count is
    * O(distinct × tokens) per row — bounded by document length, not
    * corpus size. */
  def repetitionMetrics(text: Column): Seq[(String, Column)] = {
    val ws = tokens(text)
    val nTokens = size(ws)
    val topFreq = array_max(transform(array_distinct(ws),
      w => size(filter(ws, x => x === w))))
    val bigrams = transform(
      sequence(lit(1), greatest(lit(1), nTokens - 1)),
      i => array_join(slice(ws, i, lit(2)), " "))
    Seq(
      "top_word_ratio" -> (topFreq.cast("double") / nTokens),
      "dup_bigram_ratio" ->
        (lit(1.0) - size(array_distinct(bigrams)).cast("double") / size(bigrams)))
  }
}

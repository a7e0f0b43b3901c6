package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators for the training-data pipeline: the
  * selection / normalization / statistics passes that run between
  * dedup and training-set export.
  *
  * Everything here is ENGINE-PORTABLE-DETERMINISTIC: sampling and
  * stratification decide membership by comparing md5 hex strings
  * (bit-identical across engines, uniform by construction), never by
  * `rand()` — so a curation run is reproducible, resumable, and
  * verifiable against the DuckDB oracle. At 100 TB that property is
  * what makes a sample auditable: membership is a pure function of the
  * key, so re-runs, retries, and incremental extensions agree without
  * coordination or stored state.
  */
object Curation {

  /** Hex md5 threshold for a uniform `fraction`: the first 12 nibbles
    * carry the fraction (48 bits — granularity 3.6e-15), the rest pad
    * to the full 32-char digest width for lexicographic compare.
    * `fraction >= 1.0` returns "g" — lexicographically above every hex
    * digest — so a full-sample request keeps EVERY row (a clamped
    * all-f threshold would deterministically drop digests at or above
    * it). */
  def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction")
    if (fraction >= 1.0) "g"
    else {
      val nibbles = math.min((fraction * math.pow(16, 12)).toLong, (1L << 48) - 1)
      f"$nibbles%012x" + "0" * 20
    }
  }

  /** Deterministic uniform sample: keep a row iff
    * `md5(key) < threshold(fraction)`. One codegen'd filter, no
    * shuffle, no RNG state; membership survives re-runs and composes
    * with incremental ingestion (a row's fate never changes).
    * A full sample (`fraction >= 1.0`) is the identity — no filter. */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    if (fraction >= 1.0) { require(fraction <= 1.0, s"fraction $fraction"); df }
    else df.filter(md5(col(keyCol).cast("string")) < lit(hexThreshold(fraction)))

  /** Deterministic weighted sample without replacement (Efraimidis &
    * Spirakis, "Weighted random sampling with a reservoir", IPL 2006):
    * keep the `m` rows with the largest key `u^(1/w)` — equivalently
    * the largest `ln(u)/w` — where `u` is the row's md5-derived
    * uniform. A row's inclusion odds are proportional to its weight
    * (heavier docs: quality scores, domain boosts) yet membership is a
    * pure function of (key, weight), so re-runs and incremental
    * extensions agree with zero RNG state — same property as
    * [[deterministicSample]], which is the w≡const special case.
    *
    * `u = (h + ½)/16¹²` from the first 48 md5 bits is an EXACT double
    * (49-bit numerator, power-of-two denominator), so both engines
    * compute `ln(u)/w` from identical inputs; the priority is floored
    * to integer nano-units before ranking, making the selection
    * hash-exact vs DuckDB.
    *
    * Rows with weight ≤ 0 are excluded (zero weight = zero inclusion
    * probability; negative weights are undefined under ES).
    *
    * Plan at 100 TB: the priority is one codegen'd projection; the
    * top-m is a TakeOrdered (per-partition heads + driver k-merge),
    * never a global sort. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      m: Int): DataFrame = {
    require(m > 0, s"m=$m")
    val h = conv(substring(md5(col(keyCol).cast("string")), 1, 12), 16, 10)
      .cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(281474976710656.0) // 16^12
    val pr = floor(log(u) / col(weightCol).cast("double") * lit(1e9)).cast("long")
    val top = df
      .filter(col(weightCol) > 0)
      .withColumn("pr_micro", pr)
      .orderBy(col("pr_micro").desc, col(keyCol).asc)
      .limit(m)
    top.withColumn("samp_rank",
      row_number().over(Window.orderBy(col("pr_micro").desc, col(keyCol).asc))
        .cast("long"))
  }

  /** Deterministic train/val/test split assignment: each row lands in
    * the first split whose cumulative-fraction md5 threshold exceeds
    * its key hash. A pure function of the key — membership is
    * coordination-free, reproducible, and STABLE UNDER GROWTH: a new
    * document never moves an existing one between splits (the property
    * a shuffled `randomSplit` cannot give an evolving 100 TB corpus,
    * and the reason eval sets stay uncontaminated across corpus
    * versions). Proportions are uniform-approximate (48-bit hash
    * granularity); exact-count splits need a sort — use
    * [[stratifiedTopN]] when counts must be exact.
    *
    * Map-only: one codegen'd CASE chain, zero shuffles. */
  def assignSplits(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(splits.forall(_._2 > 0.0), s"fractions must be positive: $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1: $splits")
    val h = md5(col(keyCol).cast("string"))
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val first = when(h < lit(hexThreshold(cums.head)), lit(splits.head._1))
    val chain = splits.init.zip(cums.init).drop(1)
      .foldLeft(first) { case (acc, ((name, _), cum)) =>
        acc.when(h < lit(hexThreshold(cum)), lit(name)) }
    df.withColumn("split", chain.otherwise(lit(splits.last._1)))
  }

  /** Stratified top-N per class: N rows per `classCol` value, chosen
    * by md5 order of the key (uniform within the class, deterministic
    * across engines and runs). The WindowGroupLimit rewrite keeps the
    * shuffle at O(N × classes), not O(rows). */
  def stratifiedTopN(df: DataFrame, classCol: String, keyCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy(col(classCol))
      .orderBy(md5(col(keyCol).cast("string")).asc, col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn")
  }

  /** Temperature-flattened mixture sampling (the data-mixing step of
    * multi-source pre-training corpora): per source/domain `s` with
    * `n_s` documents, keep `t_s = min(n_s, ceil(scale · sqrt(n_s)))`
    * documents — sublinear in source size, so dominant sources are
    * downweighted relative to the tail (the α = 0.5 point of the
    * `p^α` temperature family). The per-source target is a pure
    * per-group function (sqrt is IEEE-correctly-rounded, so both
    * engines compute the identical integer target — deliberately NOT
    * the Σ-normalized form, whose cross-source double sum is
    * order-dependent); membership within a source is md5-order of the
    * key, same as [[stratifiedTopN]].
    *
    * Plan: one hash exchange on `classCol` serves the count, the
    * count-join, and the row_number window (Catalyst reuses the
    * clustering); WindowGroupLimit cannot apply (the limit is
    * per-group data, not a literal) but the shuffle stays O(rows of
    * the class) with no extra exchange. */
  def temperatureMixture(df: DataFrame, classCol: String, keyCol: String,
      scale: Double): DataFrame = {
    val targets = df.groupBy(col(classCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__t", least(col("__n"),
        ceil(lit(scale) * sqrt(col("__n").cast("double"))).cast("long")))
      .select(col(classCol), col("__t"))
    val w = Window.partitionBy(col(classCol))
      .orderBy(md5(col(keyCol).cast("string")).asc, col(keyCol).asc)
    df.join(targets, Seq(classCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__t"))
      .drop("__rn", "__t")
  }

  /** Canonical text normalization for dedup/fingerprint pipelines:
    * lowercase → non-alphanumerics to spaces → collapse runs → trim.
    * Pure built-ins, fully codegen'd. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** PII redaction: emails then IPv4 literals replaced with typed
    * placeholders — the standard pre-training scrub pass. Pure
    * `regexp_replace` (codegen'd, one projection, no shuffle); the
    * patterns are RE2-compatible so the DuckDB oracle computes the
    * identical result. Extend by chaining more patterns. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(c,
        "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
      "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b", "<IP>")

  /** Token-budget admission per class (the budgeted twin of
    * [[temperatureMixture]]): within each `classCol` value, walk the
    * documents in md5(key) order — the same deterministic uniform
    * order the other samplers use — and admit documents while the
    * EXCLUSIVE running token total is still under `budget`. The
    * document that crosses the budget line is the last one in (how
    * byte budgets conventionally close), so every class lands in
    * [budget, budget + max_doc_tokens). Membership is a pure function
    * of the key set, so re-runs and engines agree exactly — no RNG,
    * no float accumulation (the running sum is integer).
    *
    * Plan: ONE hash exchange on `classCol` serves the window sort and
    * the running sum. The within-class prefix sum has the same
    * 100 TB shape as [[packSequences]]' global offsets: a single
    * monster class should go through the distributed prefix-sum
    * decomposition there; for the many-sources mixing case (classes
    * ≪ rows, each class executor-sized) the window form is the right
    * plan. */
  def tokenBudgetSample(df: DataFrame, classCol: String, keyCol: String,
      tokensCol: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget $budget")
    val w = Window.partitionBy(col(classCol))
      .orderBy(md5(col(keyCol).cast("string")).asc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__prev",
        coalesce(sum(tokensCol.cast("long")).over(w), lit(0L)))
      .filter(col("__prev") < budget)
      .drop("__prev")
  }

  /** Per-class quality gate: keep rows whose `scoreCol` sits at or
    * above the class's `q`-quantile — "drop the bottom 60% of each
    * language by quality" as one declarative pass. The threshold is
    * the EXACT type-7 interpolated percentile (the q23 parity shape:
    * Spark `percentile` ≡ DuckDB `quantile_cont`), so the cut is
    * reproducible across engines; the comparison itself is a plain
    * double ≥ of two identically-derived values.
    *
    * Plan: one hash exchange on `classCol` for the percentile
    * aggregate (exact percentile buffers the class's scores — at
    * 100 TB swap in `approx_percentile`, whose error contract is
    * gated in Round10Spec), then the O(classes) threshold relation
    * broadcasts back onto the unshuffled scan: the corpus itself
    * crosses the network zero times. */
  def qualityPercentileFilter(df: DataFrame, classCol: String,
      scoreCol: Column, q: Double): DataFrame = {
    require(q > 0 && q < 1, s"quantile $q")
    val thr = df.groupBy(col(classCol))
      .agg(percentile(scoreCol, lit(q)).as("__thr"))
    df.join(broadcast(thr), Seq(classCol))
      .filter(scoreCol >= col("__thr"))
      .drop("__thr")
  }

  /** Benchmark-contamination check (decontamination pass): documents
    * sharing ≥ `minHits` distinct k-shingles with the evaluation
    * corpus, with the overlap count. The join key is the shingle —
    * bounded fanout on the (small) eval side, never corpus×corpus; at
    * 100 TB the eval shingle set broadcasts. */
  def contaminationCheck(docs: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String, k: Int = 5, minHits: Long = 1): DataFrame = {
    import graft.functions.TextFunctions.wordShingles
    def grams(df: DataFrame) = df.select(col(idCol).as("id"),
      explode(wordShingles(col(textCol), k)).as("gram"))
    val evalGrams = grams(evalDocs).select("gram").distinct()
    grams(docs)
      .join(broadcast(evalGrams), "gram")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }

  /** Benchmark decontamination — the REMOVAL step completing
    * [[contaminationCheck]] (which only reports): drop every document
    * sharing ≥ `minHits` distinct k-gram(s) with the eval set, keep
    * the rest. Same plan as the check (eval grams broadcast against
    * the exploded corpus — the eval set is the small side by
    * definition) with a LEFT ANTI join on the flagged ids; the corpus
    * crosses the network once, as gram hits, never as text. */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String, k: Int = 5,
      minHits: Long = 1): DataFrame = {
    val flagged = contaminationCheck(docs, evalDocs, idCol, textCol,
      k, minHits).select(idCol)
    docs.join(flagged, Seq(idCol), "left_anti")
  }

  /** Bloom-filter decontamination — the sketch twin of
    * [[decontaminate]] (same relationship as Misra-Gries to
    * [[heavyHitters]]): the eval corpus's distinct k-gram hashes go
    * into a [[graft.functions.GraftBloom]] sized for `fpp`, and each
    * document is kept by a MAP-ONLY probe — zero joins, zero shuffles,
    * the corpus never crosses the network.
    *
    * Sketch contract (spec-asserted in Round19Spec against the exact
    * operator): NO false negatives — every document the exact pass
    * removes, this removes (Bloom filters never miss a member) — and
    * false-positive removals bounded by ~`fpp` per probed gram, so
    * the kept set is a subset of the exact kept set. Use the exact
    * pass when auditability of every removal matters; use this when
    * the corpus is 100 TB and the eval set fits a few MB of filter.
    * The filter builds distributedly (per-partition bit arrays,
    * OR-tree-reduced) and travels as a BROADCAST, fetched once per
    * executor. GraftBloom's independently-seeded probes are what make
    * a tiny `fpp` actually deliver ~fpp — Spark's sketch BloomFilter's
    * double-hashing probe cycles put a ~1e-5 FP floor under any
    * requested rate (measured; see [[graft.functions.GraftBloom]]). */
  def bloomDecontaminate(docs: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String, k: Int = 5, minHits: Long = 1,
      fpp: Double = 0.001): DataFrame = {
    require(minHits >= 1, s"minHits=$minHits")
    require(fpp > 0 && fpp < 1, s"fpp=$fpp")
    import graft.functions.TextFunctions.shingleHashes
    val evalHashes = evalDocs
      .select(explode(shingleHashes(col(textCol), k)).as("h"))
      .distinct()
    val n = math.max(1L, evalHashes.count())
    require(graft.functions.GraftBloom.numWords(n, fpp).toLong * 8L <= (256L << 20),
      s"bloom filter would exceed 256 MB for $n eval grams at fpp=$fpp: " +
        "shrink the eval set, raise fpp, or fall back to the exact " +
        "decontaminate join")
    val bloom = graft.functions.GraftBloom.build(evalHashes, "h", n, fpp)
    val bc = docs.sparkSession.sparkContext.broadcast(bloom)
    docs.filter(graft.functions.GraftExpressions
      .bloom_hit_count(shingleHashes(col(textCol), k), bc) < minHits)
  }

  /** Sequence packing for pretraining batches: assign each document a
    * byte-exact position in the concatenated token stream (ordered by
    * `idCol`) and the `targetTokens`-sized window it starts in —
    * offset-chunked packing, deterministic and engine-portable.
    *
    * The global running offset is a DISTRIBUTED PREFIX SUM, not one
    * big window: range-partition by id, cumsum within each partition,
    * add the driver-collected per-partition prefix (O(partitions)
    * rows). A plain `Window.orderBy(id)` would drag the corpus through
    * a single partition — the classic 100 TB bottleneck. The result is
    * partition-invariant: offsets depend only on the id order. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      targetTokens: Int): DataFrame = {
    require(targetTokens > 0, s"targetTokens $targetTokens")
    val tokens = size(split(col(textCol), " ")).cast("long")
    val parts = docs.select(col(idCol), tokens.as("n_tokens"))
      .repartitionByRange(col(idCol))
      .withColumn("__pid", spark_partition_id())
      .persist()
    try {
      val prefixes: Map[Int, Long] = {
        val totals = parts.groupBy("__pid").agg(sum("n_tokens").as("t"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
        totals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) => (pid, acc + t) }
          .sliding(2).collect { case Array((_, acc), (pid, _)) => pid -> acc }
          .toMap
      }
      val spark = docs.sparkSession
      import spark.implicits._
      val prefixDf = broadcast(prefixes.toSeq.toDF("__pid", "__prefix"))
      val w = Window.partitionBy("__pid").orderBy(col(idCol))
      parts
        .join(prefixDf, Seq("__pid"), "left")
        .withColumn("offset",
          coalesce(col("__prefix"), lit(0L)) +
            sum(col("n_tokens")).over(w) - col("n_tokens"))
        .withColumn("window_id", floor(col("offset") / targetTokens))
        .select(col(idCol), col("n_tokens"), col("offset"), col("window_id"))
        .localCheckpoint()
    } finally { parts.unpersist(); () }
  }

  /** Sliding-window chunking for context-length-bounded training:
    * split each document into `windowTokens`-token chunks every
    * `strideTokens` tokens (stride < window ⇒ overlapping chunks, the
    * standard long-document strategy for fixed-context models). Chunk
    * starts are 0, stride, 2·stride, … < n_tokens; the final chunk may
    * be short.
    *
    * Entirely MAP-SIDE — tokenize, enumerate starts, slice — zero
    * shuffles, so it scales embarrassingly: at 100 TB each parquet
    * split chunks independently and the plan stays one
    * WholeStageCodegen span over the scan.
    *
    * Output: (id, chunk_id, n_tokens, chunk_text), chunk_id 0-based. */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int, strideTokens: Int): DataFrame = {
    require(windowTokens > 0 && strideTokens > 0 &&
      strideTokens <= windowTokens,
      s"need 0 < stride ≤ window, got window=$windowTokens stride=$strideTokens")
    val toks = split(col(textCol), " ")
    docs
      .select(col(idCol).as("id"), toks.as("__toks"))
      .select(col("id"),
        posexplode(sequence(lit(0), greatest(size(col("__toks")) - 1, lit(0)),
          lit(strideTokens))).as(Seq("chunk_id", "__start")),
        col("__toks"))
      .select(col("id"), col("chunk_id"),
        slice(col("__toks"), col("__start") + 1, lit(windowTokens)).as("__chunk"))
      .select(col("id"), col("chunk_id"),
        size(col("__chunk")).as("n_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }

  /** Hashing-trick n-gram linear classifier — the fastText shape
    * (Joulin '16): features are word unigrams + 2-shingles WITH
    * multiplicity, each hashed into `dim` buckets (hashing trick, no
    * vocabulary pass over the corpus), scored by a linear model and
    * mean-pooled. The p34 scorer reads pre-computed quality features;
    * this is the *text-native* classifier a curation pipeline trains
    * on labeled spam/quality data — weights here are a deterministic
    * function of the bucket index so the gate is self-contained (a
    * trained table swaps in as a broadcast join/UDF without changing
    * the plan).
    *
    * Engine-portable exactness (the p30 discipline): the feature hash
    * is the first 8 hex chars of md5 (identical in any engine) mod
    * `dim`; the per-bucket weight is integer arithmetic
    * ((idx·2654435761 + 12345) mod 1997 − 998); the document score
    * accumulates as an exact BIGINT sum (order-independent — a double
    * sum would depend on shuffle order), and only the final
    * mean-pooling is one double division:
    * score = Σw / (1997 · n_terms). keep = (Σw ≥ 0), decided in
    * integer domain.
    *
    * Plan at 100 TB: explode terms → one (id) shuffle with map-side
    * combine for the BIGINT sum. Nothing else moves; the weight
    * "lookup" is in-plan arithmetic (a real weight table broadcasts). */
  def hashedNgramClassifier(docs: DataFrame, idCol: String,
      textCol: String, dim: Int = 4096): DataFrame = {
    require(dim > 0, s"dim=$dim")
    val toks = split(col(textCol), " ")
    val bigrams = transform(
      sequence(lit(1), greatest(lit(1), size(toks) - lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(2))))
    // spread: the per-term md5 bucketing below is the plan's CPU wall
    // on one-row-group inputs (see Par.spread)
    val terms = graft.util.Par.spread(
        docs.select(col(idCol).as("id"), col(textCol)))
      .select(col("id"), explode(concat(toks, bigrams)).as("term"))
    val idx = Selection.md5Bucket(col("term"), 8, dim)
    val w = (idx * 2654435761L + 12345L) % 1997L - 998L
    terms
      .select(col("id"), w.as("w"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_terms"), sum(col("w")).as("wsum"))
      .select(col("id"), col("n_terms"),
        (col("wsum").cast("double") /
          (lit(1997.0) * col("n_terms").cast("double"))).as("score"),
        (col("wsum") >= 0L).as("keep"))
  }

  /** Tokenizer-vocabulary coverage: per-document fraction of token
    * OCCURRENCES outside the corpus' top-`vocabSize` vocabulary (the
    * OOV-rate curation metric; docs heavy in out-of-vocabulary tokens
    * inflate sequence length under a fixed tokenizer). Vocabulary rank
    * is (freq DESC, word ASC) so the cut is deterministic across
    * engines.
    *
    * Plan at 100 TB: one word shuffle with map-side combine +
    * TakeOrderedAndProject builds the top-V relation; its V rows are
    * driver-collected like IVF centroids — a metadata-scale constant
    * (V ≪ corpus, caller-bounded), never the corpus — and probed by
    * the plan-resident [[graft.functions.OovCount]] hash set in a
    * map-only pass (zero further shuffles, tokens × O(1) per row;
    * the previous literal-array `array_contains` HOF was interpreted
    * AND tokens × O(V) — measured in PLANS.md at V=100k).
    * Output: (idCol, n_tokens, oov_frac). */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize=$vocabSize")
    require(vocabSize <= 4 * 1024 * 1024,
      s"vocabSize=$vocabSize: the vocabulary is driver-collected and " +
        "plan-resident; beyond ~4M entries use a broadcast-join " +
        "formulation instead")
    val vocab: Array[String] = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word").asc)
      .limit(vocabSize)
      .collect().map(_.getString(0))
    // broadcast, not plan-resident: fetched once per executor and the
    // hash set builds once per JVM (cached by broadcast id) instead of
    // once per task
    val bc = docs.sparkSession.sparkContext.broadcast(vocab)
    val ws = split(col(textCol), " ")
    docs.select(col(idCol),
      size(ws).as("n_tokens"),
      (graft.functions.GraftExpressions.oov_count(col(textCol), bc)
        .cast("double") / size(ws)).as("oov_frac"))
  }

  /** Exact heavy hitters over the corpus bigram space: bigrams whose
    * occurrence count is ≥ total/φInv — the "frequent phrases"
    * relation feeding boilerplate detection, stop-phrase lists, and
    * n-gram LM pruning. The keep decision is exact integer arithmetic
    * (`cnt · φInv ≥ total`), so the boundary is engine-portable.
    *
    * Plan at 100 TB: ONE term shuffle with map-side combine builds
    * the O(vocab) count relation; the total re-aggregates from THAT
    * relation (O(vocab), never a second corpus pass) and broadcasts
    * back as a 1-row cross join. For vocabularies too large to
    * shuffle comfortably, [[misraGriesTopTerms]] is the sketch path —
    * gated against this exact operator in Round14Spec. */
  def heavyHitters(docs: DataFrame, textCol: String, phiInv: Long): DataFrame = {
    require(phiInv > 0, s"phiInv=$phiInv")
    // native 2-shingles with multiplicity (identical values to the
    // inline HOF this replaces, incl. the whole-list short-doc rule)
    val bigrams = graft.functions.TextFunctions.wordShinglesAll(col(textCol), 2)
    // NOTE: do NOT checkpoint `counts` here — both consumers sit in
    // ONE final plan, so Spark's ReusedExchange already runs the
    // corpus bigram shuffle once; forcing materialization measured
    // 12 s → 21 s at the 100× corpus (the opposite of knPerplexity,
    // whose consumers could not share an exchange)
    val counts = docs.select(explode(bigrams).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("n"))
    // DECIMAL comparison: cnt·phiInv as a long would wrap past 2⁶³ at
    // exactly the 100 TB corpus size this operator documents (cnt ~
    // 1e13 × phiInv 1e6), silently DROPPING the heaviest hitters
    counts.crossJoin(broadcast(total))
      .filter(col("cnt").cast(org.apache.spark.sql.types.DecimalType(38, 0))
        * phiInv >=
        col("n").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
      .select("term", "cnt")
  }

  /** Misra-Gries heavy-hitter SKETCH over the same bigram space — the
    * scale path when the vocabulary itself is too large to
    * materialize: each partition keeps k counters (one corpus pass,
    * O(k) memory), summaries merge associatively (counts added, the
    * (k+1)-th largest subtracted, non-positives dropped — Agarwal et
    * al. '12 mergeable-summaries rule). Guarantee: every term with
    * true count > N/(k+1) survives, and each reported count is a
    * lower bound within N/(k+1) of truth. Driver result is O(k). */
  def misraGriesTopTerms(docs: DataFrame, textCol: String, k: Int): Seq[(String, Long)] = {
    require(k > 0, s"k=$k")
    val toks = split(col(textCol), " ")
    val bigrams = transform(
      sequence(lit(1), greatest(lit(1), size(toks) - lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(2))))
    val terms = docs.select(explode(bigrams).as("term"))
    def shrink(m: scala.collection.mutable.HashMap[String, Long]): Unit =
      if (m.size > k) {
        val cut = m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
        m.mapValuesInPlace((_, v) => v - cut)
        m.filterInPlace((_, v) => v > 0)
      }
    val summaries = terms.rdd.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { row =>
        val t = row.getString(0)
        m.updateWith(t)(c => Some(c.getOrElse(0L) + 1L))
        // amortized batch shrink: let the buffer grow to 2k, then cut
        // back to ≤k in one O(k log k) pass — O(log k) per element
        // instead of a sort per miss; the cut rule (and therefore the
        // N/(k+1) error bound) is the same one the merge uses
        if (m.size > 2 * k) shrink(m)
      }
      shrink(m)
      Iterator.single(m)
    }
    val merged = summaries.treeReduce { (a, b) =>
      b.foreach { case (t, c) =>
        a.updateWith(t)(x => Some(x.getOrElse(0L) + c)) }
      shrink(a)
      a
    }
    merged.toSeq.sortBy { case (t, c) => (-c, t) }
  }

  /** Deterministic repetition factors for dataset mixing: apportion an
    * integer `totalBudget` of training slots across rows proportional
    * to weight, by Hamilton's largest-remainder method — each row gets
    * `floor(w·B/W)` slots, and the `B − Σfloor` leftover slots go to
    * the largest remainders (ties by id). The "upsample source X by
    * 2.37 epochs" step of data-mixture recipes, made exact: integer
    * arithmetic end to end, `Σ reps = totalBudget` ALWAYS, and the
    * assignment is a pure function of (weights, budget) — re-runs and
    * engine changes agree bit-for-bit.
    *
    * Plan at 100 TB: one O(rows) aggregate for the weight total, one
    * codegen'd quota projection, one rank window over the O(rows)
    * relation for the remainder round (the same doc-level-rank class
    * as [[Selection.perplexityBuckets]] — swap in an approx remainder
    * threshold at extreme scale). Weights must be non-negative and
    * `max(w)·totalBudget` must fit a long — checked, with the decimal
    * reformulation named in the error. */
  def repetitionFactors(df: DataFrame, idCol: String, weightCol: String,
      totalBudget: Long): DataFrame = {
    require(totalBudget > 0, s"totalBudget=$totalBudget")
    // the quota arithmetic is exact INTEGER largest-remainder — a
    // fractional weight column would be silently truncated (2.9 → 2),
    // so demand an integral column and tell the caller how to rescale
    import org.apache.spark.sql.types._
    df.schema(weightCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
      case other => throw new IllegalArgumentException(
        s"repetitionFactors needs an integral weight column; '$weightCol' " +
        s"is $other — pre-scale fractional weights to integers (e.g. " +
        "round(w * 1000) as milli-weights); proportions are scale-invariant")
    }
    val agg = df.agg(sum(col(weightCol).cast("long")).as("w"),
      max(col(weightCol).cast("long")).as("mx"),
      min(col(weightCol).cast("long")).as("mn")).collect()(0)
    val totalW = agg.getLong(0); val maxW = agg.getLong(1)
    require(agg.getLong(2) >= 0, s"negative weight in $weightCol")
    require(totalW > 0, "all weights are zero")
    require(maxW <= Long.MaxValue / totalBudget,
      s"max weight $maxW times budget $totalBudget overflows long " +
        "quota arithmetic; rescale weights or reformulate the quota in " +
        "DECIMAL(38,0)")
    // integral DIV, not `/` (Divide on longs widens to double and
    // loses exactness past 2^53)
    val quota = s"(CAST(`$weightCol` AS BIGINT) * ${totalBudget}L)"
    val base = df
      .withColumn("base_reps", expr(s"$quota DIV ${totalW}L"))
      .withColumn("rem", expr(s"$quota % ${totalW}L"))
    val deficit = totalBudget -
      base.agg(sum("base_reps")).collect()(0).getLong(0)
    base
      .withColumn("__rr", row_number().over(
        Window.orderBy(col("rem").desc, col(idCol).asc)))
      .withColumn("reps",
        col("base_reps") + when(col("__rr") <= deficit, 1L).otherwise(0L))
      .drop("__rr")
  }

  /** Dataset statistics: document counts by (token-length bucket,
    * class) — the curation dashboard's length histogram. Integer
    * bucket math, one partial-aggregated shuffle. */
  def lengthHistogram(df: DataFrame, textCol: String, classCol: String,
      bucketWidth: Int): DataFrame =
    df.select(
        (floor(size(split(col(textCol), " ")) / bucketWidth) * bucketWidth)
          .cast("long").as("token_bucket"),
        col(classCol).as("class"))
      .groupBy("token_bucket", "class")
      .agg(count(lit(1)).as("n_docs"))

  /** URL canonicalization — the CommonCrawl-lineage identity step
    * before URL-level dedup (C4/RefinedWeb keep one doc per canonical
    * URL): lowercase scheme+host, drop a leading `www.`, strip the
    * scheme's default port (`:443` for https, `:80` for http), strip
    * the fragment, drop tracking query parameters (`utm_*`, `fbclid`,
    * `gclid`, `msclkid`), trim trailing path slashes (an empty path
    * canonicalizes to `/`), and surface the host-without-port as
    * `domain`. Adds `canonical_url` and `domain`.
    *
    * Pure codegen'd regexp_extract/replace chains — map-only, zero
    * shuffles, stream-safe; every regex has a byte-identical RE2 twin
    * on the oracle side. Contract notes: userinfo is not handled
    * (crawl URLs don't carry it); surviving query params keep their
    * ORIGINAL order (param-sorting would conflate distinct resources
    * on servers where order matters — the conservative choice for an
    * identity key); the tracking list is the case-sensitive lowercase
    * convention. */
  def canonicalizeUrls(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val auth1 = regexp_replace(
      regexp_replace(lower(regexp_extract(rest, "^([^/?#]*)", 1)),
        "^www\\.", ""),
      ":[0-9]+$", "")
    val port = regexp_extract(lower(regexp_extract(rest, "^([^/?#]*)", 1)),
      ":([0-9]+)$", 1)
    val keepPort = when(port === "", lit(""))
      .when(scheme === "https" && port === "443", lit(""))
      .when(scheme === "http" && port === "80", lit(""))
      .otherwise(concat(lit(":"), port))
    val pathqf = regexp_replace(rest, "^[^/?#]*", "")
    val pathTrim = regexp_replace(
      regexp_extract(pathqf, "^([^?#]*)", 1), "/+$", "")
    val path = when(pathTrim === "", lit("/")).otherwise(pathTrim)
    val query = regexp_replace(
      regexp_replace(regexp_extract(pathqf, "\\?([^#]*)", 1),
        "(?:^|&)(?:utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)=[^&]*", ""),
      "^&+", "")
    val canon = concat(scheme, lit("://"), auth1, keepPort, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
    df.withColumn("canonical_url", canon).withColumn("domain", auth1)
  }

  /** Per-domain document caps — RefinedWeb-style domain balancing: at
    * most `maxPerDomain` documents survive per canonical domain,
    * ranked by (`scoreCol` DESC, `idCol` ASC) so the cut is
    * deterministic and engine-portable. Adds `domain` (via
    * [[canonicalizeUrls]]) and `domain_rank`.
    *
    * Plan at 100 TB — exact two-stage salted top-N. A single
    * `row_number() OVER (PARTITION BY domain)` window would shuffle
    * and SORT a mega-domain's entire doc set through one task (a real
    * crawl puts 10⁸ pages on one host — a straggler holding that
    * host's whole corpus share). Instead:
    *   1. salt the domain key with `hash(id) % salts` and take the
    *      per-(domain, salt) top-`maxPerDomain` — each task sorts at
    *      most ~domainCount/salts rows;
    *   2. re-rank the ≤ salts×maxPerDomain survivors per domain and
    *      cut at `maxPerDomain`.
    * EXACT, not approximate: any row of a domain's global top-N ranks
    * ≤ N inside its salt bucket too (its bucket holds a subset of the
    * rows that beat it), so stage 1 never drops a final survivor; the
    * ordering is total (unique ids break score ties), so stage-2 ranks
    * equal the single-window ranks. Identical row set and
    * `domain_rank` values, bounded per-task fanout. */
  def domainCap(df: DataFrame, urlCol: String, idCol: String,
      scoreCol: String, maxPerDomain: Int, salts: Int = 64): DataFrame = {
    require(maxPerDomain > 0, s"maxPerDomain=$maxPerDomain")
    require(salts > 0, s"salts=$salts")
    val ord = Seq(col(scoreCol).desc, col(idCol).asc)
    val pre = canonicalizeUrls(df, urlCol)
      .withColumn("__salt", pmod(xxhash64(col(idCol)), lit(salts)).cast("int"))
      .withColumn("__srank", row_number().over(
        Window.partitionBy(col("domain"), col("__salt")).orderBy(ord: _*)))
      .filter(col("__srank") <= maxPerDomain)
      .drop("__salt", "__srank")
    pre
      .withColumn("domain_rank",
        row_number().over(Window.partitionBy(col("domain"))
          .orderBy(ord: _*)).cast("long"))
      .filter(col("domain_rank") <= maxPerDomain)
  }

  /** Weight-balanced shard assignment — the "write the corpus into N
    * equal-token training shards" step data loaders want: every doc
    * gets a shard in [0, shards) such that per-shard total weight
    * (token count) is near-equal, deterministically.
    *
    * Formulation (exact, engine-reproducible, skew-free): docs hash
    * into `salts` buckets; within each bucket they rank by
    * (weight desc, id asc); ranks deal onto shards in SNAKE order
    * (0,1,…,S−1,S−1,…,1,0,…), which cancels the systematic bias of a
    * plain modulo deal (where shard 0 would take the heaviest doc of
    * every consecutive group). Balance: within a bucket, any two
    * shards differ by at most one snake-group's weight spread; buckets
    * are independent hash samples, so deviations average out rather
    * than add. No global sort and no single-partition window — each
    * rank window covers one hash bucket (the p67 discipline), so the
    * largest task is O(corpus / salts) however skewed the weights.
    * The salt derives from md5 (bit-identical in both engines — the
    * deterministicSample discipline), which caps `salts` at 256. */
  def balancedShards(df: DataFrame, idCol: String, weightCol: String,
      shards: Int, salts: Int = 64): DataFrame = {
    require(shards >= 1, s"shards=$shards")
    require(salts >= 1 && salts <= 256, s"salts=$salts (md5-byte salt: <= 256)")
    val w = Window.partitionBy("__salt")
      .orderBy(col(weightCol).desc, col(idCol).asc)
    df.withColumn("__salt",
        conv(substring(md5(col(idCol).cast("string")), 1, 2), 16, 10)
          .cast("int") % salts)
      .withColumn("__rn", row_number().over(w) - 1)
      .withColumn("shard",
        when((col("__rn") / shards).cast("long") % 2 === 0,
          col("__rn") % shards)
          .otherwise(lit(shards - 1) - col("__rn") % shards)
          .cast("long"))
      .drop("__salt", "__rn")
  }

  /** The complete Gopher quality-rule battery (Rae et al. '21 §A1.1)
    * as a per-doc DECISION surface — where p8/p24 compute the metric
    * families, this applies the published rule set and returns every
    * rule's verdict plus the conjunction, so a curation run can both
    * filter and report per-rule rejection rates:
    *
    *   1. word count in [50, 100 000];
    *   2. mean word length in [3, 10] characters;
    *   3. symbol-to-word ratio (`#` chars + `...` occurrences) ≤ 0.1;
    *   4. ≤ 90% of lines start with a bullet, ≤ 30% end with `...`;
    *   5. ≥ 80% of words contain an alphabetic character;
    *   6. at least 2 distinct words from the required-stopword set
    *      {the, be, to, of, and, that, have, with}.
    *
    * All thresholds are evaluated as INTEGER cross-multiplications
    * (`10·symbols ≤ words`, `5·alpha ≥ 4·words`, …) — no float ever
    * decides a verdict, so the oracle can never diverge on rounding.
    * Map-only per-row expressions: zero shuffles, stream-safe (the
    * round-19 stream-native curation contract). Tokenization is the
    * repo's single-space contract; lines split on `\n`. */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val required = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val t = col(textCol)
    val ws = split(t, " ")
    val nWords = size(ws).cast("long")
    // chars excluding spaces = total word length (single-space contract)
    val sumLen = length(regexp_replace(t, " ", "")).cast("long")
    val hashes = (length(t) - length(regexp_replace(t, "#", ""))).cast("long")
    val ellipses = ((length(t) -
      length(regexp_replace(t, "\\.\\.\\.", ""))) / 3).cast("long")
    val lines = split(t, "\n")
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines, l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("•"))).cast("long")
    val ellipsisLines = size(filter(lines, l => l.endsWith("..."))).cast("long")
    val alphaWords = size(filter(ws, w => w.rlike("[a-zA-Z]"))).cast("long")
    val stopHits = size(array_intersect(array_distinct(ws),
      array(required.map(lit): _*))).cast("long")
    val rules = Seq(
      "word_count_ok" -> (nWords >= 50L && nWords <= 100000L),
      "mean_word_len_ok" -> (sumLen >= nWords * 3L && sumLen <= nWords * 10L),
      "symbol_ratio_ok" -> ((hashes + ellipses) * 10L <= nWords),
      "bullet_ok" -> (bulletLines * 10L <= nLines * 9L &&
        ellipsisLines * 10L <= nLines * 3L),
      "alpha_ratio_ok" -> (alphaWords * 5L >= nWords * 4L),
      "stopwords_ok" -> (stopHits >= 2L))
    docs.select(
      col(idCol) +: nWords.as("n_words") +:
        rules.map { case (n, c) => c.as(n) } :+
        rules.map(_._2).reduce(_ && _).as("keep"): _*)
  }
}

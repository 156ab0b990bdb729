package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: token stats,
  * quality scoring, language-ID heuristic, document fingerprinting.
  *
  * All are scan-local narrow projections built from codegen'd string/array
  * built-ins — no UDFs, no shuffle; at 100 TB they run at parquet-scan
  * speed with column pruning down to (doc_id, text).
  */
object TextOps {

  /** Tiny stopword list for the stopword-ratio heuristic. */
  val stopwords: Seq[String] = Seq("the", "a")

  def tokens(text: Column): Column = split(text, " ")

  /** The [[textStats]] columns as named expressions over a text column —
    * the single definition both the standalone stats/gate queries and
    * fused pipelines (e.g. the curation scan, which must carry OTHER
    * columns through the same projection) build from.
    */
  def textStatCols(t: Column): Seq[(String, Column)] = {
    val toks = tokens(t)
    val stopPred = stopwords.map(w => (x: Column) => x === w)
      .reduce((f, g) => (x: Column) => f(x) || g(x))
    val nTokens = size(toks).cast("long")
    val nStop = size(filter(toks, x => stopPred(x))).cast("long")
    val nUniq = size(array_distinct(toks)).cast("long")
    val nChars = length(t).cast("long")
    val nLetterChars = length(regexp_replace(t, " ", "")).cast("long")
    val stopRatio = nStop.cast("double") / nTokens
    val uniqRatio = nUniq.cast("double") / nTokens
    val avgTokLen = nLetterChars.cast("double") / nTokens
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTokens,
      "n_uniq_tokens" -> nUniq,
      "n_stopwords" -> nStop,
      "stop_ratio" -> stopRatio,
      "uniq_ratio" -> uniqRatio,
      "avg_token_len" -> avgTokLen,
      // quality score: stopword-rich, reasonably long, lexically diverse
      "quality_score" -> (stopRatio * 0.5 +
        least(nTokens, lit(100L)).cast("double") / 100.0 * 0.3 +
        uniqRatio * 0.2),
      "pred_lang" -> when(stopRatio > 0.06, lit("en")).otherwise(lit("other")))
  }

  /** Per-document token/char statistics + quality score + language-ID
    * heuristic. Ratios are single floating divisions of exact integer
    * counts — deterministic everywhere.
    */
  def textStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol) +:
      textStatCols(col(textCol)).map { case (n, c) => c.as(n) }: _*)

  /** Corpus-curation gate over [[textStats]] — the filter an LLM
    * training-data pipeline actually runs: keep documents inside the
    * quality envelope, annotate the rest with drop reasons (the DQ
    * expect/quarantine split specialized for text curation; route on
    * `keep` to materialize the two streams). Scan-local: a narrow
    * projection + predicates over per-document stats, zero shuffle at any
    * corpus size.
    */
  /** The gate's keep predicate over [[textStats]] columns — shared by the
    * standalone gate and fused pipelines so a threshold change cannot
    * diverge between them.
    */
  def qualityKeep(nTokens: Column, stopRatio: Column, uniqRatio: Column,
      minTokens: Long, maxTokens: Long,
      minStopRatio: Double, minUniqRatio: Double): Column =
    nTokens >= minTokens && nTokens <= maxTokens &&
      stopRatio >= minStopRatio && uniqRatio >= minUniqRatio

  def qualityGate(df: DataFrame, idCol: String, textCol: String,
      minTokens: Long, maxTokens: Long,
      minStopRatio: Double, minUniqRatio: Double): DataFrame =
    textStats(df, idCol, textCol).select(
      col(idCol), col("n_tokens"), col("stop_ratio"), col("uniq_ratio"),
      col("quality_score"),
      qualityKeep(col("n_tokens"), col("stop_ratio"), col("uniq_ratio"),
        minTokens, maxTokens, minStopRatio, minUniqRatio).as("keep"),
      concat_ws(";",
        when(col("n_tokens") < minTokens, lit("too_short")),
        when(col("n_tokens") > maxTokens, lit("too_long")),
        when(col("stop_ratio") < minStopRatio, lit("low_stopword_ratio")),
        when(col("uniq_ratio") < minUniqRatio, lit("low_lexical_diversity")))
        .as("drop_reasons"))

  /** One row per (doc, word-n-gram) occurrence — the shared expansion
    * behind [[repetitionStats]], [[decontaminate]] and
    * [[graft.llm.MinHashDedup.ngramJaccard]] (one tokenization
    * definition, three consumers).
    */
  def wordNgrams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol), split(col(textCol), " ").as("__w"))
      .filter(size(col("__w")) >= n)
      .select(col(idCol), explode(expr(
        s"transform(sequence(1, size(__w) - ${n - 1}), i -> concat_ws(' ', slice(__w, i, $n)))"))
        .as("ngram"))

  /** Within-document repetition stats over word n-grams — the
    * Gopher/CCNet-style quality signal boilerplate and spam light up on:
    * `dup_ratio` (fraction of n-gram occurrences that are repeats) and
    * `top_gram_ratio` (share of the single most frequent n-gram).
    * Documents shorter than `n` words drop out.
    *
    * Scale shape: one explode keyed by (doc, gram) with map-side partial
    * counts, then a per-doc rollup — shuffle volume is per-doc distinct
    * grams, bounded by document length, never corpus-quadratic.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val grams = wordNgrams(df, idCol, textCol, n).withColumnRenamed("ngram", "gram")
    grams.groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("__cnt"))
      .groupBy(col(idCol))
      .agg(
        sum("__cnt").as("n_grams"),
        count(lit(1)).as("n_uniq_grams"),
        (lit(1.0) - count(lit(1)).cast("double") / sum("__cnt")).as("dup_ratio"),
        (max("__cnt").cast("double") / sum("__cnt")).as("top_gram_ratio"))
  }

  /** Benchmark decontamination: flag corpus documents sharing at least
    * `minOverlap` distinct word-n-grams with the benchmark/eval set — the
    * leakage scan run before training so evaluation stays honest. Returns
    * (id, n_overlap) for flagged documents; anti-join the result against
    * the corpus to drop them (benchmark members flag themselves, which is
    * the desired behavior when the eval set was drawn from the corpus).
    *
    * Scale shape: the benchmark is small by construction (an eval set), so
    * its distinct-gram table broadcasts; the corpus side is one n-gram
    * scan joined on the gram key, map-side partial counts — never a
    * corpus×corpus comparison.
    */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int, minOverlap: Long): DataFrame = {
    val bg = wordNgrams(benchmark, benchIdCol, benchTextCol, n)
      .select(col("ngram")).distinct()
    // broadcast filter FIRST: the corpus gram stream shrinks to
    // benchmark-matching grams map-side before anything shuffles (a
    // corpus-wide distinct up front would shuffle every gram only to
    // discard almost all of them). countDistinct of the surviving grams
    // equals distinct-then-count because bg is distinct.
    wordNgrams(corpus, idCol, textCol, n)
      .join(broadcast(bg), Seq("ngram"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("ngram")).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** PII scrubbing: redact emails, SSNs, phone numbers, and IPv4
    * addresses with typed placeholders, and count each category for
    * auditing. Patterns stick to syntax Java regex and RE2 interpret
    * identically (char classes, bounded repeats, \b, \d) so the SQL
    * oracle matches byte-for-byte; replacement order is fixed.
    * Scan-local, zero shuffle — the redaction pass a training pipeline
    * runs between quality filtering and tokenization.
    *
    * Count semantics: `n_<cat>` counts pattern occurrences in the
    * ORIGINAL text (what was present in the source), while placeholders
    * result from the ordered replacement cascade — on overlapping or
    * adjacent matches the two can legitimately differ (an email eating a
    * phone-shaped local part, a boundary created by an earlier
    * placeholder). Reconcile audits against the source counts, not by
    * counting placeholders in `clean`.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    // (category, pattern, placeholder) — applied in this order
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"))

  def scrubPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val clean = piiPatterns.foldLeft(col(textCol)) {
      case (c, (_, pat, repl)) => regexp_replace(c, pat, repl)
    }
    val counts = piiPatterns.map { case (cat, pat, _) =>
      regexp_count(col(textCol), lit(pat)).cast("long").as(s"n_$cat")
    }
    df.select(col(idCol) +: clean.as("clean") +: counts: _*)
  }

  /** Deterministic hash-based corpus split (train/holdout): bucket =
    * first-8-hex of sha256(id ∥ salt) mod 100, split = "train" below
    * `pctTrain`. Reproducible anywhere (engine-, partitioning- and
    * run-independent), stable under corpus growth (a document's bucket
    * never changes), and re-saltable for fresh splits — the properties a
    * random() split loses. Scan-local, zero shuffle.
    */
  /** The split bucket/label as pure COLUMN expressions over any id column
    * — [[hashSplit]] rides them, and set-level audits (near-dup pairs
    * crossing the train/holdout boundary) apply them to pair endpoints
    * without a join back to the corpus.
    */
  def splitBucket(id: Column, salt: String): Column =
    (conv(substring(
        sha2(concat(id.cast("string"), lit(salt)), 256), 1, 8), 16, 10)
      .cast("long") % 100).cast("int")

  def splitLabel(id: Column, salt: String, pctTrain: Int): Column =
    when(splitBucket(id, salt) < pctTrain, lit("train")).otherwise(lit("holdout"))

  def hashSplit(df: DataFrame, idCol: String, salt: String,
      pctTrain: Int): DataFrame = {
    require(pctTrain >= 0 && pctTrain <= 100, s"pctTrain $pctTrain not in [0,100]")
    df.withColumn("bucket", splitBucket(col(idCol), salt))
      .withColumn("split",
        when(col("bucket") < pctTrain, lit("train")).otherwise(lit("holdout")))
  }

  /** Gopher-style quality rule audit (Rae et al. 2021 §A1.1 apply a fixed
    * battery of per-document heuristics and keep only documents passing
    * ALL of them): one boolean column per rule plus the conjunction, so a
    * curation run can both filter and report per-rule drop rates. Rules
    * (thresholds are parameters; the defaults in Queries split the
    * synthetic corpus meaningfully):
    *  - token count within [minTokens, maxTokens]
    *  - mean token length within [minAvgTokLen, maxAvgTokLen]
    *  - repeated-token mass (1 − distinct/total) ≤ maxRepeatRatio
    *  - at least `minDistinctStop` DISTINCT stopwords present (Gopher's
    *    "2 of a fixed stop list" rule)
    * Every signal is exact integer counts with single correctly-rounded
    * double divisions — deterministic cross-engine. Scan-local, zero
    * shuffle: the whole audit is one narrow projection.
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      minTokens: Long, maxTokens: Long,
      minAvgTokLen: Double, maxAvgTokLen: Double,
      maxRepeatRatio: Double, minDistinctStop: Int): DataFrame = {
    val (nTokens, avgTokLen, repeatRatio, nStopDistinct) = gopherSignals(col(textCol))
    val okTok = nTokens.between(minTokens, maxTokens)
    val okLen = avgTokLen >= minAvgTokLen && avgTokLen <= maxAvgTokLen
    val okRep = repeatRatio <= maxRepeatRatio
    val okStop = nStopDistinct >= minDistinctStop
    df.select(col(idCol),
      nTokens.as("n_tokens"), avgTokLen.as("avg_token_len"),
      repeatRatio.as("repeat_ratio"), nStopDistinct.as("n_distinct_stop"),
      okTok.as("ok_token_count"), okLen.as("ok_avg_token_len"),
      okRep.as("ok_repeat_ratio"), okStop.as("ok_stopwords"),
      (okTok && okLen && okRep && okStop).as("keep"))
  }

  /** The four Gopher signals as column expressions over a text column —
    * one definition for the standalone audit and fused pipelines (the
    * curation scan evaluates the keep predicate in-scan, like
    * [[textStatCols]] for the v1 quality gate).
    */
  private[graft] def gopherSignals(t: Column): (Column, Column, Column, Column) = {
    val toks = tokens(t)
    val nTokens = size(toks).cast("long")
    val nUniq = size(array_distinct(toks)).cast("long")
    // mean token length over tokens (chars excluding separators / tokens)
    val avgTokLen = (length(t).cast("long") - (nTokens - 1L)).cast("double") / nTokens
    val repeatRatio = lit(1.0) - nUniq.cast("double") / nTokens
    val nStopDistinct = size(array_intersect(array_distinct(toks),
      array(stopwords.map(lit): _*))).cast("long")
    (nTokens, avgTokLen, repeatRatio, nStopDistinct)
  }

  /** The conjunction of all four Gopher rules as one predicate column. */
  def gopherKeep(t: Column, minTokens: Long, maxTokens: Long,
      minAvgTokLen: Double, maxAvgTokLen: Double,
      maxRepeatRatio: Double, minDistinctStop: Int): Column = {
    val (nTokens, avgTokLen, repeatRatio, nStopDistinct) = gopherSignals(t)
    nTokens.between(minTokens, maxTokens) &&
      avgTokLen >= minAvgTokLen && avgTokLen <= maxAvgTokLen &&
      repeatRatio <= maxRepeatRatio && nStopDistinct >= minDistinctStop
  }

  /** Deterministic epoch shuffle: assign each document a shard and a
    * position within it, both derived from sha256(id ∥ seed) — the
    * "global shuffle" a training loader needs, produced WITHOUT a global
    * sort. Shard = first-8-hex mod nShards (scan-local projection);
    * position = rank of the hash within the shard (one keyed window per
    * shard, all shards sorted in parallel). Re-seeding yields an
    * independent permutation per epoch; the assignment is
    * engine/partitioning/run-independent like [[hashSplit]]. At 100 TB
    * the writer emits shard files with `partitionBy(shard)` and each
    * shard sorts locally — no stage ever totally orders the corpus.
    * sha256 (not a cheaper hash) keeps the oracle replayable in SQL;
    * swap the hash, not the shape, if scan cost ever matters.
    */
  def epochOrder(df: DataFrame, idCol: String, seed: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val h = sha2(concat(col(idCol).cast("string"), lit(seed)), 256)
    val shard = (conv(substring(h, 1, 8), 16, 10).cast("long") % nShards).cast("int")
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.select(col(idCol), h.as("__h"), shard.as("shard"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Global curriculum position WITHOUT a global sort: documents are
    * ordered by (`band` asc, sha256(id ∥ salt), id) — easy bands first,
    * deterministic shuffle within a band — and each gets its absolute
    * 0-based position in that total order. The decomposition is the
    * point: shard = first hex byte of the hash key, so ordering by
    * (band, shard, key) IS ordering by (band, key); ranks come from
    * per-(band, shard) windows all sorted in parallel, and the global
    * offset of each (band, shard) block comes from a metadata-scale
    * count rollup (bands × 256 rows) joined back as a broadcast. At
    * 100 TB no stage ever totally orders the corpus — the same
    * construction as [[epochOrder]], extended with the cross-block
    * offset so consumers get an absolute curriculum index, not just a
    * per-shard rank.
    *
    * The count rollup groups by the window's own partition keys, so it
    * reuses the window exchange rather than re-shuffling the corpus.
    */
  def curriculumOrder(df: DataFrame, idCol: String, band: Column,
      salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = sha2(concat(col(idCol).cast("string"), lit(salt)), 256)
    val w = Window.partitionBy(col("band"), col("__shard"))
      .orderBy(col("__k"), col(idCol))
    val ranked = df
      .select(col(idCol), band.as("band"), key.as("__k"),
        substring(key, 1, 2).as("__shard"))
      .withColumn("__r", row_number().over(w).cast("long"))
    val counts = ranked.groupBy(col("band"), col("__shard"))
      .agg(max(col("__r")).as("__n"))
    // exclusive prefix over the tiny block table (band-major, shard minor)
    val offW = Window.orderBy(col("band"), col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(offW), lit(0L)))
      .select(col("band"), col("__shard"), col("__off"))
    ranked.join(broadcast(offsets), Seq("band", "__shard"))
      .select(col(idCol), col("band"),
        (col("__off") + col("__r") - 1L).as("curriculum_pos"))
  }

  /** Sliding-window chunking for retrieval corpora: fixed `window`-token
    * chunks every `stride` tokens (overlapping when stride < window),
    * the standard RAG context-construction step. Every document yields
    * at least one window; the last window is truncated at the document
    * end rather than padded. Output one row per window:
    * `(id, win_id, tok_lo, tok_hi, n_tokens, chunk_text)` with 1-based
    * inclusive token offsets back into the source document.
    *
    * Scale shape: entirely scan-local — the window list is computed
    * in-row (`transform` over a `sequence` of starts, bounded by
    * ⌈len/stride⌉) and exploded; no shuffle at any corpus size. Window
    * count uses integer arithmetic only, so the chunk boundaries are
    * engine-exact.
    */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__len", size(col("__toks")).cast("long"))
      // nw = 1 + ceil((len - window) / stride) for len > window, else 1
      .withColumn("__nw", expr(
        s"CASE WHEN __len <= $window THEN 1 " +
          s"ELSE ((__len - $window + ${stride - 1}) DIV $stride) + 1 END"))
      .select(col(idCol), col("__toks"), col("__len"),
        explode(expr("sequence(1, __nw)")).as("win_id"))
      .withColumn("tok_lo",
        (lit(1L) + (col("win_id") - 1) * stride).cast("long"))
      .withColumn("tok_hi",
        least(col("tok_lo") + lit(window.toLong - 1), col("__len")))
      .select(col(idCol), col("win_id").cast("int").as("win_id"),
        col("tok_lo"), col("tok_hi"),
        (col("tok_hi") - col("tok_lo") + 1).as("n_tokens"),
        concat_ws(" ", expr(
          s"slice(__toks, CAST(tok_lo AS INT), " +
            "CAST(tok_hi - tok_lo + 1 AS INT))")).as("chunk_text"))
  }

  /** Deterministic stratified sample: at most `perStratum` documents per
    * stratum (source/language/domain), chosen by sha256(id ∥ salt) rank —
    * the corpus-mixture subsampling step a training-data pipeline runs to
    * rebalance over-represented sources. Same determinism contract as
    * [[hashSplit]]: engine/partitioning/run-independent, re-saltable, and
    * a document's rank only improves as competitors are removed (stable
    * under corpus shrinkage). One keyed window shuffle; the rank limit
    * applies map-side (WindowGroupLimit), so the exchange carries at most
    * perStratum × partitions rows per stratum, never whole strata.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      perStratum: Int, salt: String): DataFrame = {
    require(perStratum > 0, s"perStratum must be positive, got $perStratum")
    import org.apache.spark.sql.expressions.Window
    val rankKey = sha2(concat(col(idCol).cast("string"), lit(salt)), 256)
    val w = Window.partitionBy(col(strataCol))
      .orderBy(rankKey.asc, col(idCol).asc)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= perStratum)
  }

  /** Per-stratum token-budgeted sampling: documents taken in
    * sha256(id ∥ salt) rank order within each stratum until the
    * cumulative token count would exceed `budget` — the curriculum /
    * mixture-construction primitive ("give me ~N tokens per source,
    * deterministically"). Like [[hashSplit]]/[[stratifiedSample]], the
    * hash ranking is engine-, partitioning-, and growth-stable.
    *
    * Scale shape: one keyed shuffle. The rank filter (`rank ≤ budget` —
    * a doc has ≥1 token, so later ranks can never fit) applies map-side
    * via WindowGroupLimit BEFORE the cumulative sum, so the stratum
    * window never carries more than `budget` rows even over a
    * billion-doc stratum.
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, strataCol: String,
      textCol: String, budget: Long, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = sha2(concat(col(idCol).cast("string"), lit(salt)), 256)
    val w = Window.partitionBy(col(strataCol)).orderBy(key, col(idCol))
    val cumW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(strataCol),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= budget)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(cumW))
      .filter(col("cum_tokens") <= budget)
      .select(col(idCol), col(strataCol), col("n_tokens"), col("cum_tokens"))
  }

  /** Canonical text normalization: lowercase, strip non-alphanumerics,
    * collapse whitespace — the preprocessing step before fingerprinting.
    */
  def normalizeText(t: Column): Column =
    trim(regexp_replace(regexp_replace(lower(t), "[^a-z0-9 ]", ""), " +", " "))

  /** Document fingerprint: sha256 of the normalized text + a short prefix
    * bucket for grouping (rolling-hash family stand-in, deterministic).
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = sha2(normalizeText(col(textCol)), 256)
    df.select(col(idCol), fp.as("fingerprint"), substring(fp, 1, 4).as("fp_bucket"))
  }

  /** Characteristic trigram profiles for the n-gram language-ID heuristic.
    * Tiny on purpose — production swaps in learned profiles; the operator
    * shape (occurrence scoring + argmax) is what matters.
    */
  val langTrigrams: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "ing", "ion", " of"),
    "de" -> Seq("der", "sch", "ein", "ich", "und"),
    "fr" -> Seq("les", "ent", "que", "des", "ais"))

  /** Language ID via n-gram occurrence scoring: per language, total
    * characters matched by its characteristic trigrams in the lowercased
    * text; prediction = argmax with first-profile tie-break. Scan-local
    * string built-ins only.
    */
  private def langScores(textCol: Column): Seq[(String, Column)] = {
    val lt = lower(textCol)
    // literal occurrence counting: non-regex StringReplace — the regexp
    // engine buys nothing for fixed trigrams and costs ~5× per pass (15
    // passes per row); the oracle's replace() is the same operator
    langTrigrams.map { case (lang, grams) =>
      lang -> grams.map(g =>
          length(lt) - length(call_function("replace", lt, lit(g))))
        .reduce(_ + _).cast("long")
    }
  }

  /** The language decision over ALREADY-MATERIALIZED score columns — ONE
    * definition shared by the per-doc id query and the confusion audit.
    * Taking columns (not the text) matters: the CASE references each
    * score twice, and inlining the 5-regexp score stacks would evaluate
    * ~30 regexes per row; multi-referenced projection aliases survive
    * CollapseProject, so each score runs once.
    */
  def langPredFrom(en: Column, de: Column, fr: Column): Column =
    when(en >= de && en >= fr, "en").when(de >= fr, "de").otherwise("fr")

  private def withLangScores(df: DataFrame, textCol: String,
      keep: Seq[Column]): DataFrame =
    df.select(keep ++ langScores(col(textCol)).map {
      case (l, c) => c.as(s"score_$l")
    }: _*)

  def langIdNgram(df: DataFrame, idCol: String, textCol: String): DataFrame =
    withLangScores(df, textCol, Seq(col(idCol)))
      .withColumn("pred_lang", langPredFrom(
        col("score_en"), col("score_de"), col("score_fr")))

  /** Language-ID confusion audit: predicted language vs the corpus's
    * labeled `lang` column — the text-plane twin of
    * [[graft.llm.Similarity.labelCoherence]] (off-diagonal cells name
    * mislabeled slices or profile drift). Scan-local projections + one
    * L² rollup; zero data shuffled beyond the confusion cells.
    */
  def langConfusion(df: DataFrame, textCol: String,
      langCol: String): DataFrame =
    withLangScores(df, textCol, Seq(col(langCol).as("lang")))
      .select(col("lang"), langPredFrom(
        col("score_en"), col("score_de"), col("score_fr")).as("pred_lang"))
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n"))

  /** BPE-ish pretokenizer pattern (GPT-2 family shape, ASCII classes only
    * so Java and RE2 regex engines agree): contractions, space-prefixed
    * letter runs, space-prefixed digit runs, space-prefixed punctuation
    * runs, residual whitespace.
    */
  val bpeishPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"

  /** Token counting two ways (SURVEY text-analysis plane): whitespace
    * tokens and a BPE-ish regex pretokenization — the cheap proxy for "how
    * many LLM tokens does this document cost". Scan-local projection.
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(tokens(col(textCol))).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col(textCol), lit(bpeishPattern), lit(0)))
        .cast("long").as("n_bpeish_tokens"),
      length(col(textCol)).cast("long").as("n_chars"))

  /** Corpus vocabulary top-k: the most frequent whitespace tokens with
    * occurrence AND document frequencies — the heavy-hitters pass behind
    * tokenizer-vocab building and stopword/IDF table construction.
    *
    * Deterministic: ties break on the token string, so the cutoff never
    * flips across runs or partitionings.
    *
    * Scale shape: two-level aggregation — (token, doc) partial counts
    * map-side, then per-token rollup — so the shuffle carries per-doc
    * DISTINCT tokens, bounded by document length; the top-k itself plans
    * as TakeOrderedAndProject (per-partition heaps, k rows to the
    * driver), never a global sort of the vocabulary.
    */
  def vocabTopK(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"), col(idCol))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("token"))
      .agg(sum(col("__n")).as("n_occurrences"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("token").asc)
      .limit(k)

  /** PMI collocations (Church & Hanks 1990, "Word association norms,
    * mutual information, and lexicography"): the top-k adjacent token
    * pairs by pointwise mutual information, with a pair-count floor so
    * one-off juxtapositions cannot top the list.
    *
    * Emits the PMI RATIO p(a,b)/(p(a)·p(b)) = n_pair·N_tok²/(N_big·n_a·n_b)
    * rather than its log: the ratio is a monotone transform of PMI (the
    * ranking is identical), and it crosses engines bit-exactly — exact
    * BIGINT counts into one fixed-shape chain of IEEE double ops —
    * where a libm `ln` could drift an ulp (same stance as
    * [[sourceEntropy]], minus the need for quantization).
    *
    * Scale shape: ONE corpus-scale exchange — the bigram hash-agg with
    * map-side partials. Unigram counts, both totals, and the final join
    * all operate on the vocabulary(²)-bounded stat tables (unigrams
    * broadcast twice; totals roll up the stat tables instead of
    * rescanning the corpus), and the top-k is TakeOrderedAndProject,
    * never a global sort.
    */
  def pmiCollocations(docs: DataFrame, textCol: String, minPair: Long,
      k: Int): DataFrame = {
    val pairCounts = docs
      .select(tokens(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(__w) - 1), " +
          "i -> named_struct('w1', __w[i - 1], 'w2', __w[i]))")).as("__b"))
      .groupBy(col("__b.w1").as("w1"), col("__b.w2").as("w2"))
      .agg(count(lit(1)).as("n_pair"))
    val uniCounts = docs
      .select(explode(tokens(col(textCol))).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__n"))
    val nTokens = uniCounts.agg(sum(col("__n")).as("__n_tok"))
    val nBigrams = pairCounts.agg(sum(col("n_pair")).as("__n_big"))
    pairCounts.filter(col("n_pair") >= minPair)
      .join(broadcast(uniCounts.select(col("__t").as("w1"), col("__n").as("n_a"))), Seq("w1"))
      .join(broadcast(uniCounts.select(col("__t").as("w2"), col("__n").as("n_b"))), Seq("w2"))
      .crossJoin(broadcast(nTokens))
      .crossJoin(broadcast(nBigrams))
      // fixed-shape double chain — written IDENTICALLY in the oracle SQL
      .withColumn("pmi_ratio",
        (col("n_pair").cast("double") * col("__n_tok") * col("__n_tok")) /
          (col("__n_big").cast("double") * col("n_a") * col("n_b")))
      .select(col("w1"), col("w2"), col("n_pair"), col("n_a"), col("n_b"),
        col("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  /** Per-source lexical-diversity rollup — the data-card metric that
    * catches a source gone templated/repetitive before training on it:
    * token volume, vocabulary size, type-token ratio, and Shannon
    * unigram entropy (nats).
    *
    * Entropy crosses engines safely the same way the mixture
    * denominator does: each `-(p·ln p)` term is floor-quantized to 1e-9
    * and summed as exact BIGINTs, so the order-sensitive float sum and
    * the 1-ulp libm `ln` spread both disappear below the quantum
    * (p = c/N is a single exact division; ~1e-7 flip odds per term).
    *
    * Scale shape: (source, token) counts aggregate with map-side
    * partials — the shuffle carries per-source distinct tokens, not
    * occurrences; the per-source rollup is vocabulary-bounded.
    */
  def sourceEntropy(df: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val counts = df
      .select(col(sourceCol), explode(tokens(col(textCol))).as("__t"))
      .groupBy(col(sourceCol), col("__t"))
      .agg(count(lit(1)).as("__c"))
    val totals = counts.groupBy(col(sourceCol))
      .agg(sum(col("__c")).as("__n"), count(lit(1)).as("n_types"))
    val p = col("__c").cast("double") / col("__n").cast("double")
    counts.join(broadcast(totals), Seq(sourceCol))
      .groupBy(col(sourceCol))
      .agg(max(col("__n")).as("n_tokens"), max(col("n_types")).as("n_types"),
        (-(sum(floor(p * log(p) * lit(1000000000.0)).cast("long"))
          .cast("double") / lit(1000000000.0))).as("entropy"))
      .withColumn("ttr", col("n_types").cast("double") / col("n_tokens").cast("double"))
  }

  /** Per-document distinctive term: the token with the LOWEST corpus
    * document frequency (ties: higher in-document count, then token
    * order) — TF-IDF-flavored keyword extraction with exact integer
    * ordering instead of a float idf, so the ranking is engine- and
    * partitioning-independent (cross-engine log() rounding can flip a
    * rank; (df ASC, tf DESC, token ASC) cannot).
    *
    * Scale shape: the (doc, token) counts aggregate with map-side
    * partials (shuffle = per-doc distinct tokens); the document-frequency
    * table is VOCABULARY-sized — bounded in practice, broadcast onto the
    * counts so no corpus-side shuffle pays for it; the final rank-1 is a
    * doc-keyed window whose limit applies map-side (WindowGroupLimit).
    */
  def distinctiveTerms(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // persisted: the document-frequency rollup and the scoring join both
    // read the tf rows — one token explode, not two
    val tf = graft.CacheBin.register(df
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("df").asc, col("tf").desc, col("token").asc)
    tf.join(broadcast(dfreq), Seq("token"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("token"), col("tf"), col("df"))
  }

  /** Winnowing fingerprints (the rolling-hash fingerprint family): k-gram
    * polynomial rolling hashes (base 257 mod 1e9+7 over code points),
    * window-of-w minima, per-document distinct set — summarized as
    * count/min/max/sum so the result stays one row per document.
    *
    * Entirely array-built-ins inside one projection: no explode, no
    * shuffle — the winnow window runs over the in-row hash array
    * (`array_min(slice(...))`), so at corpus scale this is a pure
    * parquet-scan-speed pass like the other TextOps.
    */
  /** The per-document winnow fingerprint SET as an array column — the
    * shared kernel behind [[winnowFingerprints]] (summary) and
    * [[winnowPairs]] (candidate generation).
    */
  def winnowSets(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    val B = 257L
    val M = 1000000007L
    val hashes =
      s"""transform(sequence(1, length($textCol) - ${k - 1}),
            i -> aggregate(sequence(0, ${k - 1}), 0L,
                   (acc, j) -> (acc * $B + ascii(substring($textCol, i + j, 1))) % $M))"""
    // the hash array is let-bound (Let.bound), not projected as an alias:
    // an alias here is one CollapseProject away from re-evaluating the
    // O(len·k) rolling-hash build per window position — the O(len²·k)
    // trap — whenever a downstream consumer (the winnowPairs explode, a
    // fused scan) pulls the projection chain together. The binding makes
    // single evaluation structural, so the frame is safe to RECOMPUTE:
    // under bench-wide cache pressure the memoized persist
    // (winnowSetsShared) can evict without turning linear work quadratic.
    val fp = Let.bound(expr(hashes)) { hs =>
      array_distinct(transform(
        sequence(lit(1), size(hs) - (w - 1)),
        i => array_min(slice(hs, i, lit(w)))))
    }
    Spread(df).filter(length(col(textCol)) >= k + w - 1)
      .select(col(idCol), fp.as("__fp"))
  }

  /** Session-memoized [[winnowSets]]: the rolling-hash fingerprint table
    * is the expensive shared input of BOTH the per-doc summary
    * (`q_winnow`) and the pair generation (`q_winnow_pairs`) — build and
    * persist it once per (session, corpus, k, w) and let every consumer
    * read the same frame. At 100 TB this is "materialize the fingerprint
    * table to the store once"; the memo encodes that decision in-session.
    */
  def winnowSetsShared(df: DataFrame, corpusKey: String, idCol: String,
      textCol: String, k: Int, w: Int): DataFrame =
    graft.SessionMemo.cached(df.sparkSession,
      s"winnowsets:$corpusKey:$idCol:$textCol:$k:$w")(
      winnowSets(df, idCol, textCol, k, w)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, sets: Option[DataFrame] = None): DataFrame =
    sets.getOrElse(winnowSets(df, idCol, textCol, k, w))
      .select(
        col(idCol),
        size(col("__fp")).cast("long").as("n_fp"),
        expr("array_min(__fp)").as("fp_min"),
        expr("array_max(__fp)").as("fp_max"),
        expr("aggregate(__fp, 0L, (a, x) -> a + x)").as("fp_sum"))

  /** Coverage audit for the [[winnowPairs]] bucket gate — the "no silent
    * caps" companion every capped pipeline needs before its output is
    * trusted: fingerprints occurring in more than `bucketCap` docs are
    * dropped BEFORE pair expansion (correct — a stopword region must
    * never fan out a quadratic bucket), but on a corpus where most
    * fingerprints run hot (boilerplate-heavy, or any corpus big enough
    * that common regions exceed an absolute cap) that silently drives
    * pair recall toward zero. The 10× scale probe surfaced exactly this:
    * winnow_pairs returned 0 rows at 10× because every fingerprint
    * bucket blew past the cap on the tiny-vocabulary synthetic corpus.
    * One row: distinct/singleton/hot fingerprint counts, occurrence
    * totals, and `pair_coverage` — the fraction of fingerprint
    * occurrences that remain pairable under the cap. An operator reads
    * this BEFORE the sweep: coverage near 0 means the cap (or the
    * fingerprint scheme) needs re-tuning for this corpus, and no pair
    * output should be believed. Cost: the same fp-keyed exchange the
    * pair stage pays, ending in a corpus-size-invariant single row.
    */
  def winnowCoverage(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, bucketCap: Int,
      sets: Option[DataFrame] = None): DataFrame = {
    val perFp = sets.getOrElse(winnowSets(df, idCol, textCol, k, w))
      .select(explode(col("__fp")).as("fp"))
      .groupBy(col("fp")).agg(count(lit(1)).as("n_occ"))
    perFp.agg(
        count(lit(1)).as("n_fp_distinct"),
        sum(col("n_occ")).as("n_occ_total"),
        sum(when(col("n_occ") === 1, 1L).otherwise(0L)).as("n_fp_singleton"),
        sum(when(col("n_occ") > bucketCap, 1L).otherwise(0L)).as("n_fp_hot"),
        sum(when(col("n_occ") > bucketCap, col("n_occ")).otherwise(0L))
          .as("n_occ_hot"),
        sum(when(col("n_occ").between(2, bucketCap), col("n_occ"))
          .otherwise(0L)).as("n_occ_pairable"))
      .select(col("n_fp_distinct"), col("n_occ_total"), col("n_fp_singleton"),
        col("n_fp_hot"), col("n_occ_hot"), col("n_occ_pairable"),
        (col("n_occ_pairable").cast("double") / col("n_occ_total"))
          .as("pair_coverage"))
  }

  /** MOSS-style winnow candidate pairs: documents sharing ≥ `minShared`
    * winnow fingerprints — the local-similarity dedup modality beside
    * MinHash (global resemblance) and SimHash (topical distance): a
    * shared fingerprint pins a shared ~(k+w)-char REGION, so heavily
    * templated or partially copied documents surface even when global
    * similarity is low.
    *
    * Same scale guards as the LSH banding: fingerprints shared by more
    * than `bucketCap` docs are dropped BEFORE any expansion (a stopword
    * region must never fan out a quadratic bucket), surviving buckets
    * expand pairs in-row, and the per-pair count of shared (capped)
    * fingerprints is the ranking signal.
    */
  def winnowPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, minShared: Long, bucketCap: Int,
      sets: Option[DataFrame] = None): DataFrame = {
    require(bucketCap >= 2 && bucketCap <= 1000,
      s"bucketCap $bucketCap outside [2, 1000]: the in-row pair expansion " +
        "is sized for capped buckets; see MinHashDedup.candidatePairs")
    // no barrier needed: winnowSets let-binds its hash array (Let.bound),
    // so pulling the fingerprint build into the explode's projection
    // evaluates it once per row — the former cache here guarded against
    // CollapseProject re-evaluating the build per fingerprint position
    // (O(len²·k); measured minutes for 500 docs), which the binding now
    // rules out structurally. Callers wanting cross-query reuse pass the
    // memoized frame via `sets` (winnowSetsShared).
    val fps = sets.getOrElse(winnowSets(df, idCol, textCol, k, w))
      .select(col(idCol), explode(col("__fp")).as("fp"))
    // bucket gate as a window count over the SAME fp-keyed shuffle the
    // collect_list aggregation needs — one exchange for the whole
    // candidate stage (the previous count-aggregate + semi-join shape
    // shuffled the exploded fingerprints twice); same single-exchange
    // pattern as SimHash.hammingPairs' (band, bv) gate
    val byFp = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    fps
      .withColumn("__bn", count(lit(1)).over(byFp))
      .filter(col("__bn").between(2, bucketCap))
      .groupBy(col("fp"))
      .agg(collect_list(col(idCol)).as("__ids"))
      .select(explode(expr(
        """filter(
             flatten(transform(__ids,
               a -> transform(__ids, b -> named_struct('doc_a', a, 'doc_b', b)))),
             p -> p.doc_a < p.doc_b)""")).as("__p"))
      .select(col("__p.doc_a").as("doc_a"), col("__p.doc_b").as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Word-n-gram heavy hitters — [[vocabTopK]] generalized to phrases:
    * top-k n-grams by occurrence count with document frequencies
    * (collocation mining / boilerplate-phrase discovery). Same two-level
    * aggregation and TakeOrderedAndProject shape.
    */
  def ngramTopK(df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame =
    wordNgrams(df, idCol, textCol, n)
      .groupBy(col("ngram"), col(idCol))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("ngram"))
      .agg(sum(col("__n")).as("n_occurrences"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("ngram").asc)
      .limit(k)

  /** Character k-shingles as (id, shingle) rows. Guarded so texts shorter
    * than k yield no rows (`sequence` would count DOWN for start > stop).
    * `distinct=false` skips the per-corpus dedup shuffle — correct whenever
    * the consumer is duplicate-insensitive (e.g. MinHash signatures).
    */
  def charShingles(df: DataFrame, idCol: String, textCol: String, k: Int,
      distinct: Boolean = true): DataFrame = {
    val t = col(textCol)
    val positions = when(length(t) >= k, sequence(lit(1), length(t) - (k - 1)))
      .otherwise(array().cast("array<int>"))
    val out = df.select(col(idCol), t.as("__t"), explode(positions).as("__pos"))
      .select(col(idCol), expr(s"substring(__t, __pos, $k)").as("shingle"))
    if (distinct) out.distinct() else out
  }
}

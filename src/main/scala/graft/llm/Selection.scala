package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data-selection operators for assembling a training mix: importance
  * weighting toward a target distribution (the DSIR family — Xie et al.
  * 2023, "Data Selection for Language Models via Importance Resampling",
  * which ranks raw documents by how target-like their n-gram distribution
  * is) and temperature-scaled domain mixture weights (the multilingual /
  * multi-domain sampling rule from mBERT/XLM-R-style training, p_i ∝
  * n_i^τ).
  *
  * Everything is built from exact integer counts with float steps confined
  * to single correctly-rounded IEEE operations (×, ÷, sqrt) plus
  * DECIMAL(28,12)-exact sums, so results are bit-identical across engines
  * — the same determinism discipline as [[Similarity]]'s decimal cosine.
  * No ln/pow: a transcendental differs in the last ulp between libm and
  * the JVM, which is why the importance score is the (smoothed) mean
  * probability RATIO rather than the mean log-ratio — a monotone-in-spirit
  * stand-in that preserves the ranking DSIR needs while staying exactly
  * reproducible.
  */
object Selection {

  /** Per-document importance score toward `targetPred` (e.g. `lang='en'`):
    * score(d) = (1/|d|) · Σ_{t ∈ d} [(ct_t+1)(Nr+V)] / [(cr_t+1)(Nt+V)]
    * where ct/cr are target/corpus token occurrence counts, Nt/Nr the
    * token totals and V the vocabulary size (add-one smoothing). Selection
    * keeps the top ⌈N·keepNum/keepDen⌉ documents by (score desc, id asc).
    *
    * Scale shape: the token-stats table is VOCABULARY-sized — broadcast
    * onto the exploded corpus so the only corpus-scale shuffle is the
    * per-document partial-aggregated sum; the selection threshold is a
    * TakeOrdered (top-k without a global window), so no single-partition
    * stage touches corpus-sized data. At 100 TB the vocabulary table stops
    * being broadcastable only past ~10^8 distinct tokens; shuffle-join the
    * stats at that point, nothing else changes.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, keepNum: Int = 1, keepDen: Int = 4,
      totalRows: Option[Long] = None): DataFrame = {
    require(keepNum >= 1 && keepDen >= keepNum,
      s"keep fraction $keepNum/$keepDen outside (0, 1]")
    val toks = docs.select(col(idCol), targetPred.as("__t"),
      explode(TextOps.tokens(col(textCol))).as("token"))
    // persisted: the vocabulary totals and the scoring broadcast both
    // read the per-token stats — without it each re-runs the corpus
    // token aggregate
    val stats = graft.CacheBin.register(toks.groupBy(col("token")).agg(
      count(lit(1)).as("__cr"),
      sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val totals = stats.agg(
      sum(col("__cr")).as("__nr"),
      sum(col("__ct")).as("__nt"),
      count(lit(1)).as("__v"))
    // per-token ratio: exact integer arithmetic into one double division
    // (correctly rounded everywhere), then a DECIMAL(28,12) cast so the
    // per-document sum is order-independent
    val ratio = ((col("__ct") + 1).cast("double") * (col("__nr") + col("__v")).cast("double") /
      ((col("__cr") + 1).cast("double") * (col("__nt") + col("__v")).cast("double")))
      .cast(DecimalType(28, 12))
    // persisted: the two TakeOrdered threshold passes and the final
    // selection join all read the per-document scores — one scoring
    // pass, not three
    val scored = graft.CacheBin.register(toks
      .join(broadcast(stats), Seq("token"))
      .crossJoin(broadcast(totals))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(ratio).cast("double") / count(lit(1))).as("dsir_score"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // threshold row via TakeOrdered twice (k-th best), not a global
    // window: rank the top-k slice ascending and keep its last row.
    // The limit() below needs the corpus size as a PLAN-TIME literal, so
    // a size must be known eagerly — callers with a catalog/session row
    // count pass it via totalRows (Queries routes Tables.rowCount's
    // session cache) so plan construction triggers no corpus scan; the
    // count() fallback is for ad-hoc frames without one.
    val n = totalRows.getOrElse(docs.count())
    val k = ((n * keepNum + keepDen - 1) / keepDen).toInt
    val thr = scored
      .orderBy(col("dsir_score").desc, col(idCol).asc).limit(k)
      .orderBy(col("dsir_score").asc, col(idCol).desc).limit(1)
      .select(col("dsir_score").as("__ts"), col(idCol).as("__td"))
    scored.crossJoin(broadcast(thr))
      .select(col(idCol), col("n_tokens"), col("dsir_score"),
        (col("dsir_score") > col("__ts") ||
          (col("dsir_score") === col("__ts") && col(idCol) <= col("__td")))
          .as("selected"))
  }

  /** Corpus-bigram language-model quality score — the determinism-safe
    * form of CCNet-style LM filtering (Wenzek et al. 2020 rank documents
    * by LM perplexity; low-probability word sequences indicate boilerplate
    * / word salad). Per document: the mean over its bigram positions of
    * the Laplace-smoothed conditional P(w2|w1) = (c(w1,w2)+1)/(c(w1,·)+V),
    * where counts are corpus-wide and V is the unigram vocabulary size.
    * No log/pow (a transcendental differs in the last ulp across libm
    * implementations): the mean probability preserves the ranking the
    * filter needs while staying bit-identical cross-engine — each term is
    * exact integer counts → one correctly-rounded double division →
    * DECIMAL(28,12), summed exactly, one final division.
    *
    * Scale shape: the bigram/predecessor stat tables are
    * vocabulary²-bounded (far below corpus scale) — broadcast onto the
    * exploded bigram stream, so the only corpus-scale shuffle is the
    * per-document partial-aggregated sum. Past ~10^8 distinct bigrams the
    * stats side shuffle-joins instead; nothing else changes.
    */
  def lmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bigrams = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(__w) - 1), " +
          "i -> named_struct('w1', __w[i - 1], 'w2', __w[i]))")).as("__b"))
      .select(col(idCol), col("__b.w1").as("w1"), col("__b.w2").as("w2"))
    val bigramCounts = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("__c12"))
    // c(w1,·) = Σ_w2 c(w1,w2): roll up the vocabulary²-bounded bigram
    // table instead of re-aggregating the corpus-scale bigram stream
    val predCounts = bigramCounts.groupBy(col("w1"))
      .agg(sum(col("__c12")).as("__c1"))
    val vocab = docs
      .select(explode(TextOps.tokens(col(textCol))).as("__t"))
      .agg(count_distinct(col("__t")).as("__v"))
    val term = ((col("__c12") + 1).cast("double") /
      (col("__c1") + col("__v")).cast("double")).cast(DecimalType(28, 12))
    val scored = bigrams
      .join(broadcast(bigramCounts), Seq("w1", "w2"))
      .join(broadcast(predCounts), Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(term).cast("double") / count(lit(1))).as("lm_score"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("lm_score"))
  }

  /** Temperature-scaled domain mixture weights per `sourceCol`:
    * `w_prop` is the proportional (τ=1) token share, `w_temp` the τ=0.5
    * share p_i ∝ sqrt(n_i) — the standard low-resource up-sampling rule,
    * with sqrt chosen over pow(·, τ) because sqrt is a correctly-rounded
    * IEEE primitive (exact cross-engine) and pow is not.
    *
    * One aggregation keyed by source (domain-sized result); the
    * normalizing sums run over that tiny frame. At 100 TB this is a
    * metadata-scale query: per-source token totals are what the mixture
    * planner feeds the training loader.
    */
  def mixtureWeights(docs: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val per = docs
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col(textCol))).cast("long")).as("n_tokens"))
    // the sqrt-sum denominator is QUANTIZED to 1e-6 before summing:
    // floor(sqrt·1e6) of a double is bit-exact in every engine (floor
    // has no rounding mode), and the BIGINT sum is exact — whereas
    // casting an irrational double straight to DECIMAL rounds
    // differently between Spark (BigDecimal HALF_UP on the exact binary
    // value) and DuckDB (×10^s in double, then llround) near scale
    // boundaries, which shifted w_temp by 1 ulp on one sf0.1 source
    val totals = per.agg(
      sum(col("n_tokens")).as("__tot"),
      sum(floor(sqrt(col("n_tokens").cast("double")) * lit(1000000.0))
        .cast("long")).as("__stotq"))
    per.crossJoin(broadcast(totals))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("__tot").cast("double")).as("w_prop"),
        (sqrt(col("n_tokens").cast("double"))
          / (col("__stotq").cast("double") / lit(1000000.0))).as("w_temp"))
  }
}

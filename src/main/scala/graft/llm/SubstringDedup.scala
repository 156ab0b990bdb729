package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring deduplication at ARBITRARY boundaries — the
  * suffix-array dedup of Lee et al. 2022 ("Deduplicating Training Data
  * Makes Language Models Better"), re-expressed for a distributed
  * relational engine. Finds every maximal token span of length ≥ L that
  * also occurs in at least one OTHER document, wherever it starts —
  * the modality [[ChunkDedup]] (chunk-aligned only) and
  * [[TextOps.winnowPairs]] (candidate pairs only) both miss.
  *
  * The reformulation that makes it relational: a span of ≥ L tokens is
  * duplicated iff every one of its L-token windows is duplicated, and
  * conversely the union of all duplicated L-gram intervals IS exactly the
  * set of maximal duplicated spans. So instead of building a suffix array,
  * mark each position whose L-gram occurs in ≥ 2 distinct documents, then
  * merge overlapping/adjacent intervals per document (gaps-and-islands) —
  * same output as extending matches from sorted suffix anchors, with no
  * suffix sort.
  *
  * Scale shape — NEVER all-pairs, stronger than a bucket cap: duplication
  * is decided by a COUNT per gram (two-level aggregate: per-doc distinct,
  * then distinct-doc count), so a boilerplate gram occurring in 10M
  * documents is ONE aggregate row — there is no candidate-pair expansion
  * to cap at all (contrast the LSH stages, where a hot bucket must be
  * capped because pairs grow quadratically in bucket size). The pipeline
  * is: one in-row gram projection (no per-token explode of the text), one
  * hash-agg shuffle keyed by the gram for the count, one join of positions
  * against the duplicated-gram sliver (AQE broadcasts it when duplication
  * is rare, skew-splits the hot grams when it is not), then a doc-local
  * window for the island merge. Everything is linear in corpus tokens.
  *
  * Like [[ChunkDedup]], two variants: text-keyed (the DuckDB oracle
  * replays it verbatim) and xxhash64-keyed (the 100 TB formulation — the
  * corpus-scale shuffle carries an 8-byte key instead of an L-token
  * string, ~L× fewer shuffle bytes). A 64-bit collision can only create a
  * FALSE duplicate (two distinct grams colliding), at ~n²/2⁶⁵ odds —
  * identical output in practice, one shared oracle.
  */
object SubstringDedup {

  /** Maximal duplicated spans `(doc_id, span_start, span_end,
    * span_tokens)`, 1-based inclusive token positions, one row per
    * maximal span — only documents containing a duplicated span ≥ L
    * appear. `keyOf` selects the corpus-wide shuffle key for the gram
    * (identity or xxhash64).
    */
  private def spansBy(docs: DataFrame, idCol: String, textCol: String,
      minSpanTokens: Int)(keyOf: Column => Column): DataFrame = {
    require(minSpanTokens >= 2,
      s"minSpanTokens must be >= 2, got $minSpanTokens")
    val L = minSpanTokens
    // 1-based anchor positions; in-row gram construction (transform over
    // the token array — the explode emits (pos, gram) rows directly)
    val grams = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= L)
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(1, size(__toks) - ${L - 1}), " +
          s"i -> concat_ws(' ', slice(__toks, i, $L)))")))
      .select(col(idCol), (col("pos") + 1).cast("long").as("pos"),
        keyOf(col("col")).as("__g"))
    // duplicated ⟺ the gram occurs in ≥ 2 DISTINCT documents. Two-level
    // aggregate: the corpus-scale shuffle carries per-doc distinct grams
    // (bounded by token count), the doc-count rollup rides the same key.
    val dup = grams.select(col("__g"), col(idCol)).distinct()
      .groupBy(col("__g")).agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= 2)
      .select(col("__g"))
    // anchor hits, then doc-local island merge: two covered intervals
    // [i, i+L-1], [j, j+L-1] (i < j) touch iff j <= i + L, so a new
    // island starts when the gap from the previous anchor exceeds L
    val hits = grams.join(dup, Seq("__g")).select(col(idCol), col("pos"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val islands = hits
      .withColumn("__nf",
        when(lag(col("pos"), 1).over(w).isNull ||
          col("pos") > lag(col("pos"), 1).over(w) + L, 1L).otherwise(0L))
      .withColumn("__isl", sum(col("__nf"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    islands.groupBy(col(idCol), col("__isl"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(L.toLong - 1)).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** Text-keyed spans — semantics definition; the oracle replays it. */
  def substringSpans(docs: DataFrame, idCol: String, textCol: String,
      minSpanTokens: Int): DataFrame =
    spansBy(docs, idCol, textCol, minSpanTokens)(identity)

  /** [[substringSpans]] with the corpus-wide shuffle keyed by
    * xxhash64(gram) — the 100 TB shuffle-bytes lever (8-byte key vs an
    * L-token string); shares the text-keyed oracle (collision odds in
    * the scaladoc above).
    */
  def substringSpansHashed(docs: DataFrame, idCol: String, textCol: String,
      minSpanTokens: Int): DataFrame =
    spansBy(docs, idCol, textCol, minSpanTokens)(xxhash64(_))

  /** APPLY the dedup — the Lee-et-al cut: remove every token covered by
    * a duplicated L-gram occurrence that is NOT the gram's corpus-first
    * occurrence (first = lowest (doc_id, pos)), so each duplicated span
    * survives exactly once, in the earliest document that carries it.
    * Output one row per document: `(id, n_tokens, n_removed, kept_text)`
    * — kept tokens re-joined in original order, '' when everything was a
    * later copy.
    *
    * Same scale shape as [[substringSpans]] plus one token-level explode
    * and one per-doc interval join: the non-first hit intervals are
    * merged per doc (disjoint by construction), so the coverage join
    * matches each token against at most one interval — a left join on
    * the doc key with a range residual, never a row-multiplying range
    * join. First-occurrence selection is one min(struct(doc, pos)) on
    * the same gram aggregate that decides duplication — no extra
    * corpus pass.
    */
  def substringCut(docs: DataFrame, idCol: String, textCol: String,
      minSpanTokens: Int): DataFrame = {
    require(minSpanTokens >= 2,
      s"minSpanTokens must be >= 2, got $minSpanTokens")
    val L = minSpanTokens
    // persisted: the token-array projection feeds the gram explode, the
    // token explode, AND the final n_tokens select — without the persist
    // each consumer re-runs the tokenize. The gram rows themselves stay
    // unpersisted: re-exploding from the cached token arrays is cheaper
    // than caching the corpus-size gram table (measured: caching grams
    // regressed the in-bench median 1.9 -> 2.8 s under suite-wide cache
    // pressure).
    val base = graft.CacheBin.register(docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val grams = base
      .filter(size(col("__toks")) >= L)
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(1, size(__toks) - ${L - 1}), " +
          s"i -> concat_ws(' ', slice(__toks, i, $L)))")))
      .select(col(idCol), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("__g"))
    // one aggregate decides BOTH duplication and the surviving copy:
    // min(struct(doc, pos)) is the lexicographic first occurrence
    val dupFirst = grams
      .groupBy(col("__g"))
      .agg(count_distinct(col(idCol)).as("__nd"),
        min(struct(col(idCol).as("__fd"), col("pos").as("__fp"))).as("__f"))
      .filter(col("__nd") >= 2)
      .select(col("__g"), col("__f.__fd").as("__fd"), col("__f.__fp").as("__fp"))
    val nonFirst = grams.join(dupFirst, Seq("__g"))
      .filter(!(col(idCol) === col("__fd") && col("pos") === col("__fp")))
      .select(col(idCol), col("pos"))
    // island-merge the removal intervals (disjoint per doc)
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val intervals = nonFirst
      .withColumn("__nf",
        when(lag(col("pos"), 1).over(w).isNull ||
          col("pos") > lag(col("pos"), 1).over(w) + L, 1L).otherwise(0L))
      .withColumn("__isl", sum(col("__nf"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("pos")).as("__lo"),
        (max(col("pos")) + lit(L.toLong - 1)).as("__hi"))
      .select(col(idCol).as("__ivd"), col("__lo"), col("__hi"))
    // coverage: token kept iff no removal interval contains it (merged
    // intervals are disjoint → left join matches at most one row)
    val toks = base.select(col(idCol),
        posexplode(col("__toks")).as(Seq("__p0", "__tok")))
      .select(col(idCol), (col("__p0") + 1).cast("long").as("__tpos"), col("__tok"))
    val kept = toks.join(intervals,
        col(idCol) === col("__ivd") &&
          col("__tpos") >= col("__lo") && col("__tpos") <= col("__hi"),
        "left")
      .filter(col("__ivd").isNull)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__nk"),
        concat_ws(" ", expr("transform(array_sort(" +
          "collect_list(struct(__tpos, __tok))), s -> s.__tok)")).as("kept_text"))
    base.select(col(idCol), size(col("__toks")).cast("long").as("n_tokens"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("__nk"), lit(0L))).as("n_removed"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }

  /** Per-document rollup of [[substringSpans]] joined back over the
    * corpus: `n_tokens`, `n_dup_tokens` (tokens covered by some
    * duplicated span), `dup_ratio`, `n_spans` — every document appears
    * (zero-filled), the "how much of my corpus is duplicated text" audit
    * that decides whether running the cut is worth it (Lee et al. report
    * ~3–13%). One extra join of the span SLIVER against the doc-id
    * projection; the corpus pays no second gram pass.
    */
  def substringDupStats(docs: DataFrame, idCol: String, textCol: String,
      minSpanTokens: Int,
      spans: Option[DataFrame] = None): DataFrame = {
    val sp = spans.getOrElse(substringSpans(docs, idCol, textCol, minSpanTokens))
    val perDoc = sp.groupBy(col(idCol))
      .agg(sum(col("span_tokens")).as("__dup"),
        count(lit(1)).as("__nsp"))
    docs.select(col(idCol),
        size(TextOps.tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("__dup"), lit(0L)).as("n_dup_tokens"),
        (coalesce(col("__dup"), lit(0L)).cast("double") / col("n_tokens"))
          .as("dup_ratio"),
        coalesce(col("__nsp"), lit(0L)).as("n_spans"))
  }
}

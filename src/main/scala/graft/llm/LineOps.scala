package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level curation operators — the newline-delimited complement of
  * [[ChunkDedup]]'s fixed-width token chunks. Three standard pipeline
  * stages from the public web-corpus literature:
  *
  *  - [[lineDedup]]: drop every copy of a line whose corpus-wide document
  *    frequency crosses a threshold — the boilerplate-line removal of
  *    CCNet (Wenzek et al. 2020, "CCNet: Extracting High Quality
  *    Monolingual Datasets from Web Crawl Data"), where nav bars, cookie
  *    banners and share buttons repeat across millions of pages;
  *  - [[intraDocDedup]]: keep only the FIRST occurrence of each line
  *    within a single document (scan-local — repeated headers/footers
  *    inside one page);
  *  - [[lineFilter]]: rule-based junk-line stripping (too-short lines,
  *    bullet/nav fragments, uppercase-heavy lines) — the line-wise
  *    corrections of RefinedWeb (Penedo et al. 2023) and the C4
  *    line-level rules (Raffel et al. 2020).
  *
  * Unlike [[ChunkDedup]] (which keeps the first occurrence of every chunk
  * corpus-wide), [[lineDedup]] removes ALL copies of a hot line: a line
  * frequent enough to cross `minDocs` is boilerplate by definition, and
  * the first page that happened to carry it has no better claim to it
  * than the millionth.
  */
object LineOps {

  def lines(text: Column): Column = split(text, "\n")

  /** Corpus-wide boilerplate-line removal: a line is dropped from EVERY
    * document when it appears in at least `minDocs` distinct documents.
    * Returns one row per input document: the reassembled text (original
    * line order, '' when everything was boilerplate), the original line
    * count, and how many lines were dropped.
    *
    * Scale shape: one narrow per-line projection (posexplode), one
    * hash-aggregate keyed by xxhash64(line) — an 8-byte shuffle key, the
    * [[ChunkDedup.chunkDedupHashed]] decision; collision stance documented
    * there — whose distinct-doc counts use the two-level (key, doc)
    * partial-agg shape, then an anti-join of the per-line rows against the
    * HOT sliver only. The hot set is tiny by construction (lines crossing
    * a corpus-wide frequency threshold are heavy hitters), so AQE turns
    * the anti-join into a broadcast at runtime without the plan promising
    * a size it cannot know. Reassembly regroups by document — shuffle
    * bounded by the surviving lines.
    */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
      minDocs: Long): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val base = docs.select(col(idCol), lines(col(textCol)).as("__lines"))
      .select(col(idCol), col("__lines"),
        size(col("__lines")).cast("long").as("n_lines"))
    val perLine = base.select(col(idCol), col("n_lines"),
      posexplode(col("__lines")).as(Seq("__pos", "__line")))
      .withColumn("__h", xxhash64(col("__line")))
    // two-level aggregate: (hash, doc) partials first, so the per-line
    // shuffle carries distinct (line, doc) combinations, not every copy
    val hot = perLine.select(col("__h"), col(idCol))
      .distinct()
      .groupBy(col("__h")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select(col("__h"))
    val kept = perLine.join(hot, Seq("__h"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n_kept"),
        concat_ws("\n", expr("transform(array_sort(" +
          "collect_list(struct(__pos, __line))), s -> s.__line)")).as("clean_text"))
    base.select(col(idCol), col("n_lines"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("__n_kept"), lit(0L))).as("n_dropped"))
  }

  /** Within-document line dedup: keep each distinct line's FIRST
    * occurrence, preserving order. Pure narrow projection — the dedup runs
    * in-row over the line array with a positional higher-order filter
    * (first-index == own-index), so the operator is scan-local with ZERO
    * exchanges at any corpus size. The in-row scan is O(L²) over a
    * document's line count L — bounded by page size, not corpus size.
    */
  def intraDocDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val arr = lines(col(textCol))
    val kept = filter(arr, (x, i) => array_position(arr, x) === (i + 1).cast("long"))
    docs.select(col(idCol),
      concat_ws("\n", kept).as("clean_text"),
      size(arr).cast("long").as("n_lines"),
      (size(arr) - size(kept)).cast("long").as("n_dupes_removed"))
  }

  /** The [[lineFilter]] keep-predicate over a single line — shared between
    * the batch operator, fused pipelines, and specs so a rule change
    * cannot diverge. A line survives when it has at least `minTokens`
    * whitespace tokens, is not a bullet/nav fragment, and is not
    * uppercase-heavy (more than half of its letters capitalized — nav
    * bars and SHOUTING banners; the divide-free 2·upper ≤ letters form
    * also keeps letterless lines, which the token rule already owns).
    */
  def lineKeep(line: Column, minTokens: Int): Column = {
    val nTok = size(split(line, " "))
    val nUpper = length(regexp_replace(line, "[^A-Z]", ""))
    val nLetter = length(regexp_replace(line, "[^A-Za-z]", ""))
    nTok >= minTokens &&
      !line.startsWith("- ") && !line.startsWith("* ") &&
      nUpper * 2 <= nLetter
  }

  /** Rule-based junk-line stripping (C4/RefinedWeb-style line-wise
    * correction): drop bullet fragments, too-short lines, and
    * uppercase-heavy nav/banner lines; reassemble the survivors in order.
    * Scan-local — the rules evaluate in-row over the line array via a
    * higher-order filter, zero exchanges at any corpus size.
    */
  def lineFilter(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int): DataFrame = {
    val arr = lines(col(textCol))
    val kept = filter(arr, l => lineKeep(l, minTokens))
    docs.select(col(idCol),
      concat_ws("\n", kept).as("clean_text"),
      size(arr).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"))
  }
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sub-document exact deduplication: split each document into fixed-size
  * token chunks, keep only the FIRST occurrence of every distinct chunk
  * corpus-wide (first = lowest (doc_id, chunk_index)), and reconstruct
  * each document from its surviving chunks in order — the whole-corpus
  * analogue of the line-level dedup step in CCNet (Wenzek et al. 2020)
  * and MassiveText/Gopher (Rae et al. 2021), where repeated boilerplate
  * spans are removed even when the documents containing them are not
  * global near-duplicates.
  *
  * Scale shape: one narrow projection builds the chunk list in-row
  * (`transform(sequence(...))` over the token array — no per-token
  * explode), then ONE shuffle keyed by chunk text for the first-occurrence
  * window and ONE regroup by document for reconstruction. The chunk-keyed
  * window is the natural skew point (a boilerplate chunk repeated across
  * millions of docs lands on one reducer) — but the window computes only
  * row_number over (doc_id, idx), so the reducer does a sort-and-scan, not
  * a materialized group; AQE skew-split handles the rest. At 100 TB,
  * hashing the chunk (xxhash64) as the window key instead of the raw text
  * cuts shuffle bytes ~10×; kept verbatim here so the oracle can replay it
  * in SQL.
  */
object ChunkDedup {

  /** First-occurrence dedup + per-document reconstruction over an
    * already-built per-document chunk LIST — the half of the pipeline
    * every chunking policy (fixed-width, content-defined) shares. `base`
    * must carry (idCol, `n_chunks`, `__chunklist`: array&lt;string&gt;);
    * `keyOf` picks the first-occurrence window key from the chunk text.
    */
  private def dedupChunkList(base0: DataFrame, idCol: String)
      (keyOf: Column => Column): DataFrame = {
    // persisted: the chunk explode AND the final per-document join both
    // read the chunk list — without the persist the chunking pass (for
    // CDC, a sha256 per trailing gram) runs once per consumer
    val base = graft.CacheBin.register(base0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val chunks = base.select(col(idCol), col("n_chunks"),
      posexplode(col("__chunklist")))
      .select(col(idCol), col("n_chunks"), col("pos").as("__idx"),
        col("col").as("__chunk"))
    val firstWins = Window.partitionBy(keyOf(col("__chunk")))
      .orderBy(col(idCol).asc, col("__idx").asc)
    val kept = chunks
      .withColumn("__rn", row_number().over(firstWins))
      .filter(col("__rn") === 1)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", expr("transform(array_sort(" +
          "collect_list(struct(__idx, __chunk))), s -> s.__chunk)")).as("kept_text"))
    base.select(col(idCol), col("n_chunks"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }

  /** Shared pipeline for both fixed-width variants: the ONLY degree of
    * freedom is which column keys the first-occurrence window (`keyOf`
    * over the chunk text) — a tie-break or reconstruction fix lands in one
    * place instead of two silently-driftable copies.
    */
  private def chunkDedupBy(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int)(keyOf: Column => Column): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be positive, got $chunkTokens")
    val base = docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        ceil(size(col("__toks")).cast("double") / chunkTokens).cast("long").as("n_chunks"))
      .select(col(idCol), col("n_chunks"), expr(
        s"transform(sequence(0, int(n_chunks) - 1), " +
          s"i -> concat_ws(' ', slice(__toks, i * $chunkTokens + 1, $chunkTokens)))")
        .as("__chunklist"))
    dedupChunkList(base, idCol)(keyOf)
  }

  /** Per-document chunk-dedup summary: `n_chunks` (before), `n_kept`
    * (after), and `kept_text` — the document re-joined from its surviving
    * chunks in original order ('' when every chunk was seen earlier).
    * The corpus-wide shuffle is keyed by the chunk TEXT (oracle-replayable
    * verbatim in SQL).
    */
  def chunkDedup(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int): DataFrame =
    chunkDedupBy(docs, idCol, textCol, chunkTokens)(identity)

  /** [[chunkDedup]] with the first-occurrence window keyed by
    * xxhash64(chunk) instead of the chunk text — the 100 TB formulation:
    * the corpus-wide shuffle carries an 8-byte key instead of the full
    * chunk string (~10× fewer shuffle bytes at 10-token chunks), and the
    * chunk text itself stays with its owning row. Output is identical to
    * [[chunkDedup]] unless two DISTINCT chunks collide in xxhash64
    * (~n²/2⁶⁵ — for a 10¹² -chunk corpus, odds ≪ 10⁻⁹; an exact rerun of
    * the colliding bucket closes even that at the cost of one more tiny
    * shuffle, not done here). Verified against chunkDedup's oracle.
    */
  def chunkDedupHashed(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int): DataFrame =
    chunkDedupBy(docs, idCol, textCol, chunkTokens)(xxhash64(_))

  /** Per-document CONTENT-DEFINED chunk list (basic CDC, the policy under
    * FastCDC / LBFS-style dedup storage): a chunk boundary falls after
    * token position i whenever the sha256 of the trailing `window`-token
    * gram starts with a hex digit below `hexDigits` — so boundaries are a
    * function of local CONTENT, not position, and inserting or deleting a
    * prefix shifts every fixed-width chunk but leaves CDC boundaries
    * downstream of the edit untouched. With hexDigits=2 the boundary
    * probability is 2/16 → mean chunk ≈ 8 tokens. Built entirely in-row
    * (filter/transform over the token array — no per-token explode, zero
    * shuffle), with the token and boundary arrays let-bound ([[Let.bound]])
    * so each is computed once per row; the sha256 boundary rule replays verbatim
    * in DuckDB.
    *
    * Returns (idCol, n_chunks, __chunklist) for [[dedupChunkList]].
    */
  private def cdcChunkList(docs: DataFrame, idCol: String, textCol: String,
      window: Int, hexDigits: Int): DataFrame = {
    require(window >= 1, s"window must be positive, got $window")
    require(hexDigits >= 1 && hexDigits <= 15,
      s"hexDigits must be in [1,15], got $hexDigits")
    val boundaryChars = (0 until hexDigits).map(_.toHexString)
    // sequence() is clamped so it never runs descending on short docs;
    // the i+1 <= size guard (not position validity) is what keeps a
    // boundary off the final token — slice(…, i-W+1, W) is valid for
    // every generated i because the sequence starts at W.
    val chunkList = Let.bound(TextOps.tokens(col(textCol))) { ts =>
      Let.bound(filter(
        sequence(lit(window), greatest(size(ts) - 1, lit(window))),
        i => (i + 1 <= size(ts)) &&
          substring(sha2(concat_ws(" ",
            slice(ts, i - lit(window) + 1, lit(window))), 256), 1, 1)
            .isin(boundaryChars: _*))) { bs =>
        transform(sequence(lit(0), size(bs)), k => {
          val start = when(k === 0, lit(1)).otherwise(element_at(bs, k) + 1)
          val end = when(k === size(bs), size(ts)).otherwise(element_at(bs, k + 1))
          concat_ws(" ", slice(ts, start, end - start + 1))
        })
      }
    }
    docs.select(col(idCol), chunkList.as("__chunklist"))
      .select(col(idCol),
        size(col("__chunklist")).cast("long").as("n_chunks"),
        col("__chunklist"))
  }

  /** Content-defined-chunk dedup: [[chunkDedup]]'s first-occurrence
    * semantics over [[cdcChunkList]] boundaries. Catches the duplication
    * fixed-width chunking structurally cannot — a span repeated at a
    * DIFFERENT token offset (quote + commentary, boilerplate after a
    * variable-length header) re-chunks identically wherever it lands, so
    * its chunks collide corpus-wide. Same output shape and scale shape as
    * [[chunkDedup]]: the only exchanges are the chunk-keyed window and the
    * per-document regroup.
    */
  def cdcDedup(docs: DataFrame, idCol: String, textCol: String,
      window: Int, hexDigits: Int): DataFrame =
    dedupChunkList(cdcChunkList(docs, idCol, textCol, window, hexDigits), idCol)(identity)

  /** [[cdcDedup]] with the first-occurrence window keyed by
    * xxhash64(chunk) — the same 8-byte-shuffle-key trade as
    * [[chunkDedupHashed]], same collision odds argument. Verified against
    * cdcDedup's oracle.
    */
  def cdcDedupHashed(docs: DataFrame, idCol: String, textCol: String,
      window: Int, hexDigits: Int): DataFrame =
    dedupChunkList(cdcChunkList(docs, idCol, textCol, window, hexDigits), idCol)(xxhash64(_))
}

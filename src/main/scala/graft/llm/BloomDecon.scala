package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.BinaryType

/** Bloom-prefiltered eval-set decontamination — the 100 TB shape of
  * [[TextOps.decontaminate]].
  *
  * The exact variant broadcasts the benchmark's distinct-gram table and
  * hash-joins the corpus gram stream against it. That holds while the
  * benchmark is "an eval set" (thousands of docs); it breaks when the
  * held-out side is itself large — a full benchmark SUITE or another
  * corpus split can carry 10^8+ distinct grams, past any broadcast-hash
  * budget, and the fallback is shuffling the ENTIRE corpus gram stream.
  *
  * This variant keeps the corpus side shuffle-free regardless:
  *
  *  1. One aggregate pass over the benchmark grams builds a Bloom filter
  *     via Spark's native `BloomFilterAggregate` (the same machinery the
  *     runtime-filter optimization injects) — ~10 bits/key at the default
  *     1% FPP, so 10^8 grams fit in ~120 MB where a broadcast hash table
  *     of the strings would take many GB. No distinct() first: Bloom
  *     insertion is idempotent, so the duplicate-heavy raw gram stream
  *     feeds the aggregate directly and the benchmark-side shuffle is one
  *     bloom buffer per partition, not a gram-keyed exchange.
  *  2. The corpus gram stream is filtered scan-locally with the
  *     codegen'd `BloomFilterMightContain` on the SAME xxhash64 key —
  *     zero shuffle, and only the matching fraction (true overlaps plus
  *     ≤ fpp false positives) survives.
  *  3. An exact join against the distinct benchmark grams confirms the
  *     survivors. Bloom filters have no false negatives, so the result is
  *     IDENTICAL to the exact variant — `q_decontaminate_bloom` shares
  *     `q_decontaminate`'s oracle SQL verbatim. The join input is the
  *     post-bloom trickle, so even a shuffle-hash confirm join moves a
  *     vanishing fraction of the corpus; no broadcast hint on purpose —
  *     the planner picks broadcast while the benchmark is small and
  *     degrades to shuffle when it isn't, which is exactly the regime
  *     this variant exists for.
  *
  * Reference behavior mirrored: same flagged-document contract as
  * `TextOps.decontaminate` (reference `test_silver_prices.py`-style audit
  * joins scoped to the LLM plane; see SURVEY.md §2.12).
  */
object BloomDecon {

  /** Serialized Bloom filter over `xxhash64(valueCol)` built in one
    * aggregate pass. `expectedItems` is an upper bound on distinct values
    * (a non-distinct count works — overestimating only widens the filter).
    *
    * Spark caps `BloomFilterAggregate` sizing at
    * `spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold`-class
    * confs (`...maxNumItems`, default 4M; `...maxNumBits`, default 64M ≈
    * 8 MB). Those caps exist for the optimizer's auto-injected filters;
    * for an explicit build we clamp to them and document that a cluster
    * decontaminating against a 10^8-gram benchmark raises the two confs —
    * the clamp degrades FPP (more confirm-join traffic), never correctness.
    */
  def serializedBloom(df: DataFrame, valueCol: Column, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val conf = df.sparkSession.conf
    val maxItems = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    val items = math.max(1L, math.min(expectedItems, maxItems))
    val bits = math.max(1L, math.min(
      org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(items, fpp),
      maxBits))
    val agg = new BloomFilterAggregate(
      toExpression(xxhash64(valueCol)), Literal(items), Literal(bits))
    df.select(toColumn(agg.toAggregateExpression()).as("bloom"))
      .head().getAs[Array[Byte]](0)
  }

  /** Scan-local membership predicate against a built filter — native,
    * codegen'd, no shuffle. Pairs with [[serializedBloom]] (same
    * xxhash64 keying on both sides).
    */
  def mightContain(bloom: Array[Byte], valueCol: Column): Column =
    toColumn(BloomFilterMightContain(
      Literal(bloom, BinaryType), toExpression(xxhash64(valueCol))))

  /** Drop-in twin of [[TextOps.decontaminate]] (same arguments, same
    * output: `(idCol, n_overlap)` for documents sharing ≥ `minOverlap`
    * distinct word-n-grams with the benchmark), with the corpus-side
    * broadcast-hash probe replaced by the bloom prefilter + exact
    * confirm described on the object.
    */
  def decontaminateBloom(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int, minOverlap: Long, fpp: Double = 0.01): DataFrame = {
    // persisted: the gram stream feeds three consumers (sizing count,
    // bloom aggregate, confirm join) — without it each re-runs the full
    // tokenize+explode scan of the benchmark
    val bgRaw = graft.CacheBin.register(
      TextOps.wordNgrams(benchmark, benchIdCol, benchTextCol, n)
        .select(col("ngram")).persist())
    // non-distinct count: cheap upper bound, avoids a gram-keyed shuffle
    // just to size the filter
    val bloom = serializedBloom(bgRaw, col("ngram"), bgRaw.count(), fpp)
    val survivors = TextOps.wordNgrams(corpus, idCol, textCol, n)
      .filter(mightContain(bloom, col("ngram")))
    // left_semi, not inner-against-distinct: answer-identical under the
    // downstream countDistinct (no survivor-row multiplication), and it
    // keeps the benchmark side free of the gram-keyed distinct exchange
    // the bloom build just avoided
    survivors.join(bgRaw, Seq("ngram"), "left_semi")
      .groupBy(col(idCol))
      .agg(countDistinct(col("ngram")).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }
}

package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Learned byte-pair-encoding vocabulary (Sennrich et al. 2016, the
  * tokenizer-training primitive every token-budget operator ultimately
  * depends on): train merge rules on the corpus word-frequency table,
  * then re-derive per-document token counts from the learned
  * segmentation — replacing the whitespace/"BPE-ish regex" PROXY counts
  * ([[TextOps.tokenCounts]]) with counts from an actual trained
  * subword vocabulary.
  *
  * Determinism (the property that makes a cross-engine oracle possible):
  * merge order is fully specified — highest pair count first, ties broken
  * by (left symbol asc, right symbol asc); pair counts sum the word
  * frequency once per ADJACENT OCCURRENCE (so "aaa" contributes twice to
  * (a,a)); merges apply greedily left-to-right within each word. Exactly
  * `numMerges` rounds run — training `require`s the corpus supports them
  * (a corpus that exhausts earlier needs a smaller vocabulary, and the
  * caller should know).
  *
  * Scale shape: training never touches the corpus — it runs on the WORD
  * FREQUENCY table (one explode + hash-agg shuffle, output bounded by the
  * vocabulary, ~10⁵–10⁷ distinct words for natural language at ANY corpus
  * size), collected as driver-side model state exactly like the k-means
  * codebook ([[Similarity]]): bounded by construction, not by luck. The
  * training loop is O(numMerges × Σ word lengths) on that table. Applying
  * the vocabulary is a BROADCAST join of the final word→segment-count map
  * onto the exploded corpus — the corpus-scale path stays one shuffle
  * (the per-doc count rollup). Past ~10⁸ distinct words, train on a
  * frequency-truncated table (standard practice — rare-word tails don't
  * move merge counts); nothing else changes.
  */
object Bpe {

  /** Trained model: the merge table rows `(rank, a, b, merged,
    * pair_count)` in training order, and the final per-word segment
    * count under the full merge sequence.
    */
  case class Model(merges: Seq[(Int, String, String, String, Long)],
      wordSegments: Map[String, Int])

  /** Train `numMerges` merges over `(word, count)` rows. */
  def train(words: Seq[(String, Long)], numMerges: Int): Model = {
    require(numMerges >= 1, s"numMerges must be positive, got $numMerges")
    // state: each distinct word as its current symbol sequence + count
    var state: Seq[(Array[String], Long)] =
      words.map { case (w, c) => (w.toCharArray.map(_.toString), c) }
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var r = 0
    while (r < numMerges) {
      val stats = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- state; i <- 0 until syms.length - 1)
        stats.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + c))
      require(stats.nonEmpty,
        s"corpus exhausted after $r merges; lower numMerges below $numMerges")
      // deterministic selection: count desc, then (a, b) asc
      val ((a, b), cnt) = stats.minBy { case ((x, y), c) => (-c, x, y) }
      merges += ((r, a, b, a + b, cnt))
      state = state.map { case (syms, c) =>
        // greedy left-to-right application — the semantics the oracle's
        // non-overlapping replace() reproduces
        val out = Array.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.result(), c)
      }
      r += 1
    }
    Model(merges.result(),
      words.map(_._1).zip(state.map(_._1.length)).toMap)
  }

  /** The vocabulary-bounded word-frequency table (the training input —
    * ONE corpus explode + hash agg; everything after is model-sized).
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** The BOUNDED training-word collect: top `maxWords` by (count desc,
    * word asc) via TakeOrderedAndProject — never the full distinct-word
    * table. "Vocabulary-bounded" is optimistic for heavy-tailed web text
    * (easily 10⁸–10⁹ distinct tokens at 100 TB), so the driver-side model
    * state is bounded BY CONSTRUCTION here, like the k-means codebook.
    * Dropping the rare tail is standard BPE practice and cannot change
    * the learned merges as long as the cap exceeds the true vocabulary —
    * below-cap corpora (all local SFs) train on the identical table.
    * Out-of-vocabulary words at apply time segment via the distributed
    * merge replay in [[tokenCounts]], so no row is ever dropped.
    */
  def collectTrainingWords(docs: DataFrame, textCol: String,
      maxWords: Int): Seq[(String, Long)] =
    wordCounts(docs, textCol)
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq

  /** Segment count of `word` under the learned merge sequence, as a pure
    * Catalyst expression (codegen'd higher-order folds, no UDF): split to
    * characters, then replay each merge rule in rank order as a greedy
    * left-to-right fold — `(a,b)→ab` merges exactly the non-overlapping
    * adjacent pairs the driver-side trainer merges. This is the tokenizer
    * for words OUTSIDE the trained map (below the training cap's
    * frequency floor), computed distributively on the executors.
    */
  def segmentCountExpr(word: org.apache.spark.sql.Column,
      model: Model): org.apache.spark.sql.Column = {
    val chars = filter(split(word, ""), c => c =!= lit(""))
    val merged = model.merges.foldLeft(chars) { case (acc, (_, a, b, m, _)) =>
      aggregate(acc, array().cast("array<string>"), (st, x) =>
        when(size(st) > 0 &&
            try_element_at(st, lit(-1)) === lit(a) && x === lit(b),
          concat(slice(st, lit(1), size(st) - 1), array(lit(m))))
          .otherwise(concat(st, array(x))))
    }
    size(merged)
  }

  /** The learned merge table as a DataFrame:
    * `(merge_rank, a, b, merged, pair_count)`.
    */
  def mergeTable(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.merges.toDF("merge_rank", "a", "b", "merged", "pair_count")
  }

  /** Per-document BPE token counts `(id, n_words, n_bpe_tokens)`: the
    * final segmentation is known per DISTINCT trained word at training
    * end, so application is a broadcast LEFT join of the word→|segments|
    * map onto the exploded corpus. Words absent from the (cap-bounded)
    * trained map fall back to the distributed merge replay of
    * [[segmentCountExpr]] — below the training cap the fallback never
    * fires and the result is identical to the inner-join formulation; at
    * 100 TB it is what keeps rare-tail rows from being silently dropped.
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nsym = model.wordSegments.toSeq.toDF("word", "__nsym")
    docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("word"))
      .join(broadcast(nsym), Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("__nsym"), segmentCountExpr(col("word"), model))
          .cast("long")).as("n_bpe_tokens"))
  }
}

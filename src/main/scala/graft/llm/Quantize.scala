package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the storage/bandwidth scale lever for the
  * similarity plane: 4× smaller vectors than float32, and a coarse score
  * whose integer dot product is EXACT (order-independent), so coarse
  * rankings are deterministic across partitionings and engines — the
  * property float32 coarse scores cannot give.
  *
  * Scheme: symmetric per-vector scaling. `scale = max|x| / 127`,
  * `q_i = floor(x_i / scale + 0.5)` (round-half-up, identical IEEE ops in
  * any engine), reconstructed value `q_i * scale`. The approximate dot
  * product of two quantized vectors is `Σ(qa_i·qb_i) · scale_a · scale_b`
  * with the integer sum accumulated exactly.
  *
  * Retrieval pattern ([[quantizedTopK]]): coarse-rank ALL candidates by
  * the cheap int8 score, keep a `rerankFactor`×k pool, then re-rank the
  * pool with the decimal-exact float cosine — the standard
  * quantize-then-rerank trade (recall loss only where the int8 ordering
  * drops a true neighbor out of the pool). At 100 TB the coarse pass also
  * composes with IVF: quantize WITHIN inverted lists and re-rank probed
  * buckets only.
  */
object Quantize {

  /** Add a `(scale double, q array<int>)` struct column quantizing
    * `vecCol`. All-zero vectors quantize to all-zero at a tiny positive
    * scale (the MIN_NORMAL guard keeps the division defined without
    * changing any nonzero vector's scale).
    *
    * Two-step on purpose: the scale materializes as its OWN column before
    * the per-element lambda references it. Embedding the aggregate inside
    * the lambda would re-run the O(dim) max-abs scan per element (Spark
    * does not hoist loop-invariant subtrees out of higher-order-function
    * lambdas), turning quantization O(dim²) per row.
    */
  def withInt8(df: DataFrame, vecCol: String, outCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.withColumn("__qscale", greatest(
        aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x))),
        lit(2.2250738585072014e-308)) / lit(127.0))
      .withColumn(outCol, struct(col("__qscale").as("scale"),
        transform(v, x => floor(x / col("__qscale") + lit(0.5)).cast("int")).as("q")))
      .drop("__qscale")
  }

  /** Exact integer dot product of two quantized vectors, scaled back to
    * the approximate float dot product. Computed through the codegen'd
    * [[DotDecExpr.DotDecimal]] over the values as doubles: int8 products
    * are ≤ 127², so any realistic dimensionality sums exactly below 2^53 —
    * bit-identical to a long/BIGINT accumulation, at fused-loop speed
    * instead of interpreted per-element lambdas (~100× on the hot path).
    */
  def dot8(a: Column, b: Column): Column =
    Similarity.dotDec(a.getField("q").cast("array<double>"),
        b.getField("q").cast("array<double>")).cast("double") *
      a.getField("scale") * b.getField("scale")

  /** Quantize-then-rerank top-k: int8 coarse scores prune the candidate
    * set to `rerankFactor × k` per query, then the decimal-exact cosine
    * ([[Similarity.dotDec]]) ranks the pool. Both stages tie-break on
    * neighbor id, and both scores are bit-reproducible, so the result is
    * deterministic end-to-end.
    *
    * The coarse cross-join and its ranking window carry ONLY ids + int8
    * payloads — the float vectors (4× the bytes) join back for the
    * pruned ≤ rerankFactor×k pool, so the bandwidth saving the
    * quantization promises actually shows up in the shuffle.
    *
    * Contract: the query set must be broadcast-small (the same "handful of
    * probes vs the corpus" contract as [[Similarity.cosineTopK]], which
    * broadcasts it too) — the pool is |queries|·rerankFactor·k rows and is
    * broadcast EXPLICITLY so the corpus never shuffle-writes its float
    * vectors. A million-query batch needs a join-shaped retrieval instead.
    */
  /** IVF × int8 composition — the full ANN scale stack in one retrieval:
    * the probe list prunes the corpus to `nProbe` inverted lists, the
    * int8 coarse score prunes each probed list to a `rerankFactor`×k
    * pool carrying ONLY ids + int8 payloads, and the decimal-exact
    * cosine ranks the pool. At 100 TB this is "quantize WITHIN inverted
    * lists": per-query work is nProbe·√n cheap integer dots, float
    * vectors move only for the pruned pool, and every stage stays
    * deterministic (exact integer coarse sums, id tie-breaks).
    *
    * `assigned` is the session-memoized corpus assignment
    * ([[Similarity.assignedCorpusShared]]) and `centroids` its codebook —
    * the same-codebook caller contract as [[Similarity.ivfTopK]].
    */
  def ivfQuantizedTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, k: Int, nProbe: Int, rerankFactor: Int,
      centroids: DataFrame, assigned: DataFrame): DataFrame = {
    // coarse side: ids + int8 only — the quantization's bandwidth saving
    // must survive into the shuffle, exactly as in quantizedTopK
    val corpus8 = withInt8(
        assigned.select(col("vec_id").as("neighbor_id"), col("centroid_id"),
          col("__v").as("__nv")),
        "__nv", "__nz")
      .select("neighbor_id", "centroid_id", "__nz")
    val probes = Similarity.ivfRank(embeddings.filter(isQuery), idCol, vecCol,
        centroids, nProbe)
      .select(col("vec_id").as("query_id"), col("centroid_id"))
    val queries8 = withInt8(embeddings.filter(isQuery)
        .select(col(idCol).as("query_id"), col(vecCol).as("__qv")), "__qv", "__qz")
      .select(col("query_id"), col("__qz"))
      .join(probes, Seq("query_id"))
    val coarseW = Window.partitionBy(col("query_id"))
      .orderBy(col("__coarse").desc, col("neighbor_id").asc)
    val pool = corpus8.join(broadcast(queries8), Seq("centroid_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("__coarse", dot8(col("__qz"), col("__nz")))
      .withColumn("__crn", row_number().over(coarseW))
      .filter(col("__crn") <= k * rerankFactor)
      .select("query_id", "neighbor_id")
    // float vectors only for the pruned pool (bounded by construction),
    // read back from the memoized assignment — no second corpus scan
    val corpusF = assigned.select(col("vec_id").as("neighbor_id"),
      col("__v").as("__nv"), col("__vn").as("__nn"))
    val queriesF = embeddings.filter(isQuery)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        Similarity.norm2(col(vecCol)).as("__qn"))
    val exactW = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    corpusF.join(broadcast(pool), Seq("neighbor_id"))
      .join(broadcast(queriesF), Seq("query_id"))
      .withColumn("cosine",
        Similarity.dotDec(col("__qv"), col("__nv")).cast("double") /
          (sqrt(col("__qn")) * sqrt(col("__nn"))))
      .withColumn("rank", row_number().over(exactW))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** IVF-PQ retrieval — the faiss-standard 100 TB ANN layout, one step
    * past the int8 path: the corpus is stored as m sub-vector CODES
    * (m·log₂(pqK) bits per vector instead of dim·32), probes prune to
    * nProbe inverted lists, and per-query scoring is m LOOKUPS into a
    * precomputed (subspace, code) distance table (ADC — asymmetric
    * distance computation) instead of a dim-length dot product; the
    * decimal-exact cosine reranks a rerankFactor×k pool.
    *
    * Codebooks: per subspace s, the sub-vectors of the pqK LOWEST-id
    * vectors (the same deterministic convention as the IVF "low"
    * codebook; a Lloyd-refined PQ codebook slots in exactly like
    * [[Similarity.kmeansCentroidsShared]] does for IVF). Codes assign by
    * squared L2 (ties to lowest code id). This is non-residual PQ —
    * encoding the IVF residual (x − centroid) instead is the standard
    * refinement and changes only the encoded vector, not the machinery.
    *
    * Determinism: every distance term is a decimal-exact dot
    * ([[Similarity.dotDec]]); the ADC score per pair is a SUM OF m
    * DECIMALS (exact, order-independent), so pool selection — the only
    * approximate stage — is bit-identical across engines and
    * partitionings, which is what makes a DuckDB oracle possible at all.
    *
    * Scale shape: codebooks are m·pqK rows (broadcast); the ADC table is
    * |Q|·m·pqK rows (broadcast); the corpus-side work is the code
    * assignment (corpus×m rows through one window — the PQ INDEX BUILD,
    * materialized once in production) and the probed-list candidate
    * stream (m rows per candidate, map-side-combined to one). Float
    * vectors move only for the pruned pool.
    */
  /** Subspace s of a vector column: slice(v, s·(dim/m)+1, dim/m) —
    * in-plan, so no driver-side dim lookup; dim must divide by m (the
    * slice comes out short otherwise and the decimal dots catch
    * nothing), so callers pick m per their embedding dim.
    */
  private def pqSub(vecName: String, m: Int): Column =
    expr(s"slice($vecName, s * (size($vecName) div $m) + 1, " +
      s"size($vecName) div $m)")

  /** Per-subspace codebooks from the pqK lowest-id vectors; code id =
    * the source vec id (argmin ties break to the lowest).
    */
  private def pqCodebook(embeddings: DataFrame, idCol: String,
      vecCol: String, m: Int, pqK: Int): DataFrame = {
    val ss = explode(sequence(lit(0), lit(m - 1))).as("s")
    embeddings.orderBy(col(idCol)).limit(pqK)
      .select(col(idCol).cast("long").as("__cid"), col(vecCol).as("__cv0"))
      .select(col("__cid"), col("__cv0"), ss)
      .select(col("s"), col("__cid"), pqSub("__cv0", m).as("__cv"))
      .withColumn("__cn2", Similarity.norm2(col("__cv")))
  }

  /** The PQ code INDEX: nearest sub-codebook entry per (corpus vector,
    * subspace) — the corpus-side build a production deployment
    * materializes once. Exposed so callers can session-memoize it; every
    * query then pays only the probe + ADC + rerank stages.
    */
  def pqCodes(embeddings: DataFrame, idCol: String, vecCol: String,
      m: Int, pqK: Int, assigned: DataFrame): DataFrame = {
    val ss = explode(sequence(lit(0), lit(m - 1))).as("s")
    val cb = pqCodebook(embeddings, idCol, vecCol, m, pqK)
    val corpusSub = assigned
      .select(col("vec_id").as("neighbor_id"), col("centroid_id"), col("__v"), ss)
      .select(col("neighbor_id"), col("centroid_id"), col("s"),
        pqSub("__v", m).as("__sub"))
      .withColumn("__sn2", Similarity.norm2(col("__sub")))
    val codeW = Window.partitionBy(col("neighbor_id"), col("s"))
      .orderBy(col("__d2").asc, col("__cid").asc)
    corpusSub.join(broadcast(cb), Seq("s"))
      .withColumn("__d2", col("__sn2") + col("__cn2") -
        lit(2.0) * Similarity.dotDec(col("__sub"), col("__cv")).cast("double"))
      .withColumn("__rn", row_number().over(codeW))
      .filter(col("__rn") === 1)
      .select(col("neighbor_id"), col("centroid_id"), col("s"),
        col("__cid").as("__code"))
  }

  def ivfPqTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, k: Int, nProbe: Int, m: Int, pqK: Int,
      rerankFactor: Int, centroids: DataFrame, assigned: DataFrame,
      codesIn: Option[DataFrame] = None): DataFrame = {
    require(m >= 1 && pqK >= 1 && rerankFactor >= 1)
    def sub(vecName: String): Column = pqSub(vecName, m)
    val ss = explode(sequence(lit(0), lit(m - 1))).as("s")
    val cb = pqCodebook(embeddings, idCol, vecCol, m, pqK)
    val codes = codesIn.getOrElse(
      pqCodes(embeddings, idCol, vecCol, m, pqK, assigned))
    // ADC tables: decimal-exact partial dot per (query, subspace, code)
    val queries = embeddings.filter(isQuery)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        Similarity.norm2(col(vecCol)).as("__qn"))
    val tab = queries.select(col("query_id"), col("__qv"), ss)
      .select(col("query_id"), col("s"), sub("__qv").as("__qsub"))
      .join(broadcast(cb.select(col("s"), col("__cid"), col("__cv"))), Seq("s"))
      .select(col("query_id"), col("s"), col("__cid").as("__code"),
        Similarity.dotDec(col("__qsub"), col("__cv")).as("__td"))
    val probes = Similarity.ivfRank(embeddings.filter(isQuery), idCol, vecCol,
        centroids, nProbe)
      .select(col("vec_id").as("query_id"), col("centroid_id"))
    // candidate stream: m code rows per (query, probed-list vector),
    // folded to one ADC score by an exact decimal sum (partial aggs make
    // the shuffle one row per pair)
    val approx = codes.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .join(broadcast(tab), Seq("query_id", "s", "__code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("__td")).as("__ascore"))
    val poolW = Window.partitionBy(col("query_id"))
      .orderBy(col("__ascore").desc, col("neighbor_id").asc)
    val pool = approx
      .withColumn("__prn", row_number().over(poolW))
      .filter(col("__prn") <= k * rerankFactor)
      .select("query_id", "neighbor_id")
    // exact rerank over the pruned pool — float vectors from the
    // memoized assignment, both small sides broadcast (same tail as
    // ivfQuantizedTopK)
    val corpusF = assigned.select(col("vec_id").as("neighbor_id"),
      col("__v").as("__nv"), col("__vn").as("__nn"))
    val exactW = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    corpusF.join(broadcast(pool), Seq("neighbor_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("cosine",
        Similarity.dotDec(col("__qv"), col("__nv")).cast("double") /
          (sqrt(col("__qn")) * sqrt(col("__nn"))))
      .withColumn("rank", row_number().over(exactW))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  def quantizedTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, k: Int, rerankFactor: Int = 4): DataFrame = {
    val z = withInt8(embeddings.select(col(idCol), col(vecCol)), vecCol, "__z")
    val qz = z.filter(isQuery).select(col(idCol).as("query_id"), col("__z").as("__qz"))
    val cz = Spread(z).select(col(idCol).as("neighbor_id"), col("__z").as("__nz"))
    val coarseW = Window.partitionBy(col("query_id"))
      .orderBy(col("__coarse").desc, col("neighbor_id").asc)
    val pool = cz.crossJoin(broadcast(qz))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("__coarse", dot8(col("__qz"), col("__nz")))
      .withColumn("__crn", row_number().over(coarseW))
      .filter(col("__crn") <= k * rerankFactor)
      .select("query_id", "neighbor_id")
    // float vectors only for the pruned pool. BOTH small sides broadcast
    // explicitly — the pool is bounded BY CONSTRUCTION (≤ |Q|·rerankFactor·k
    // id-pairs) and the query set is broadcast-small by contract — so the
    // corpus never shuffle-writes its float vectors at all (leaving this
    // to AQE would still pay the corpus-side map write before the runtime
    // broadcast switch).
    val queries = embeddings.filter(isQuery)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        Similarity.norm2(col(vecCol)).as("__qn"))
    val corpus = embeddings
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__nv"),
        Similarity.norm2(col(vecCol)).as("__nn"))
    val exactW = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    corpus
      .join(broadcast(pool), Seq("neighbor_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("cosine",
        Similarity.dotDec(col("__qv"), col("__nv")).cast("double") /
          (sqrt(col("__qn")) * sqrt(col("__nn"))))
      .withColumn("rank", row_number().over(exactW))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}

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

  /** `(scale double, q array<int>)` for an `array<float/double>` column.
    * All-zero vectors quantize to all-zero at a tiny positive scale (the
    * MIN_NORMAL guard keeps the division defined without changing any
    * nonzero vector's scale).
    */
  def int8(vec: Column): Column = {
    val v = vec.cast("array<double>")
    val scale = greatest(
      aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x))),
      lit(2.2250738585072014e-308)) / lit(127.0)
    struct(scale.as("scale"),
      transform(v, x => floor(x / scale + lit(0.5)).cast("int")).as("q"))
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
    */
  def quantizedTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, k: Int, rerankFactor: Int = 4): DataFrame = {
    val z = embeddings.select(
      col(idCol), col(vecCol), int8(col(vecCol)).as("__z"),
      Similarity.norm2(col(vecCol)).as("__nn"))
    val queries = z.filter(isQuery).select(
      col(idCol).as("query_id"), col(vecCol).as("__qv"),
      col("__z").as("__qz"), col("__nn").as("__qn"))
    val corpus = Spread(z).select(
      col(idCol).as("neighbor_id"), col(vecCol).as("__nv"),
      col("__z").as("__nz"), col("__nn"))
    val coarseW = Window.partitionBy(col("query_id"))
      .orderBy(col("__coarse").desc, col("neighbor_id").asc)
    val pool = corpus.crossJoin(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("__coarse", dot8(col("__qz"), col("__nz")))
      .withColumn("__crn", row_number().over(coarseW))
      .filter(col("__crn") <= k * rerankFactor)
    val exactW = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    pool
      .withColumn("cosine",
        Similarity.dotDec(col("__qv"), col("__nv")).cast("double") /
          (sqrt(col("__qn")) * sqrt(col("__nn"))))
      .withColumn("rank", row_number().over(exactW))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}

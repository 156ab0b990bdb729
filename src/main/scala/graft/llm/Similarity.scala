package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers, per the scale plan:
  *   - brute-force cosine top-k: exact baseline — a broadcast of the (small)
  *     query set against the full corpus, one scan, per-partition top-k via
  *     window rank. Right answer for "a handful of probes vs the corpus".
  *   - IVF coarse assignment: every vector → nearest of K centroids; at
  *     scale the assignment is written bucketed-by-centroid so a query only
  *     scans its probe buckets (the standard IVF trade).
  *
  * Numerics: dot products and squared norms accumulate per-element products
  * as DECIMAL (exact, association-independent) before the final double
  * divide — bit-reproducible across engines and partitionings, which keeps
  * top-k CUTOFFS stable (a 1-ulp drift in a float sum can otherwise flip
  * ranks at the k boundary).
  */
object Similarity {

  /** Exact decimal-accumulated dot product of two array<float/double> cols. */
  def dotDec(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") * y.cast("double")).cast("decimal(28,12)")),
      lit(0).cast("decimal(28,12)"),
      (acc, z) => (acc + z).cast("decimal(28,12)"))

  /** Exact squared L2 norm (decimal-accumulated), as double. */
  def norm2(v: Column): Column = dotDec(v, v).cast("double")

  /** Brute-force cosine top-k: for each query vector (filtered by
    * `isQuery`), the k nearest corpus vectors by cosine similarity,
    * rank-ordered with id tiebreak.
    */
  def cosineTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, k: Int): DataFrame = {
    // norms are per-VECTOR work — compute them before the pair join, not
    // per pair (at n queries × m corpus that's n·m fewer norm passes)
    val queries = embeddings.filter(isQuery)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        norm2(col(vecCol)).as("__qn"))
    val corpus = embeddings
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__nv"),
        norm2(col(vecCol)).as("__nn"))
    val joined = corpus.crossJoin(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
    val cos = dotDec(col("__qv"), col("__nv")).cast("double") /
      (sqrt(col("__qn")) * sqrt(col("__nn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    joined
      .withColumn("cosine", cos)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Embedding-cosine near-duplicate pairs: candidates are blocked by IVF
    * centroid AND a caller-supplied blocking column (e.g. label/language/
    * source), then exact cosine filters at `threshold`. Blocking keeps the
    * self-join linear-ish instead of all-pairs quadratic — the only shape
    * that survives a corpus-scale near-dup sweep.
    */
  def cosineNearDup(embeddings: DataFrame, idCol: String, vecCol: String,
      blockCol: String, isCentroid: Column, threshold: Double): DataFrame = {
    val withNorm = embeddings.select(
      col(idCol), col(vecCol).as("__v"), col(blockCol).as("__blk"),
      norm2(col(vecCol)).as("__nn"))
    val assign = ivfAssign(embeddings, idCol, vecCol, isCentroid)
      .select(col("vec_id").as(idCol), col("centroid_id"))
    val a = withNorm.join(assign, Seq(idCol))
    val x = a.select(col(idCol).as("vec_a"), col("__v").as("__va"),
      col("__blk").as("__blka"), col("__nn").as("__na"), col("centroid_id"))
    val y = a.select(col(idCol).as("vec_b"), col("__v").as("__vb"),
      col("__blk").as("__blkb"), col("__nn").as("__nb"), col("centroid_id"))
    x.join(y, Seq("centroid_id"))
      .filter(col("__blka") === col("__blkb") && col("vec_a") < col("vec_b"))
      .withColumn("cosine", dotDec(col("__va"), col("__vb")).cast("double") /
        (sqrt(col("__na")) * sqrt(col("__nb"))))
      .filter(col("cosine") >= threshold)
      .select("vec_a", "vec_b", "cosine")
  }

  /** IVF coarse assignment: nearest centroid (squared L2) per vector.
    * Centroids are broadcast; ties break to the lowest centroid id.
    */
  def ivfAssign(embeddings: DataFrame, idCol: String, vecCol: String,
      isCentroid: Column): DataFrame = {
    val centroids = embeddings.filter(isCentroid)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("__cv"),
        norm2(col(vecCol)).as("__cn"))
    val joined = embeddings
      .select(col(idCol).as("vec_id_"), col(vecCol).as("__v"),
        norm2(col(vecCol)).as("__vn"))
      .crossJoin(broadcast(centroids))
    val d2 = col("__vn") + col("__cn") -
      lit(2.0) * dotDec(col("__v"), col("__cv")).cast("double")
    val w = Window.partitionBy(col("vec_id_"))
      .orderBy(col("dist2").asc, col("centroid_id").asc)
    joined
      .withColumn("dist2", d2)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("vec_id_").as("vec_id"), col("centroid_id"), col("dist2"))
  }
}

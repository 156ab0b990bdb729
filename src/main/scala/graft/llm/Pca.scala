package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component analysis over the embedding corpus, fit INSIDE the
  * engine's cross-engine determinism contract (the same discipline as
  * [[Classifier]]): every distributed sum is a floor-quantized-BIGINT sum
  * (partition- and engine-order-independent), the eigensolver is a FIXED
  * number of power-iteration steps (not convergence-tested) with the
  * iterate re-quantized to the 1e-9 grid after every step, and the one
  * irrational primitive — sqrt for the norm — is exact under IEEE-754, so
  * the DuckDB oracle unrolls the identical steps as CTEs and lands on
  * bit-identical loadings.
  *
  * Why PCA in a training-data engine: centering + rotation onto the top
  * principal directions is the standard preprocessing in front of
  * product quantization (it equalizes sub-vector energy — the OPQ
  * observation) and the cheapest embedding-drift / redundancy diagnostic:
  * the eigenvalue spectrum says how much of the corpus's variance a
  * k-dim sketch keeps.
  *
  * Scale shape: the fit reduces the corpus to dim + dim² sufficient
  * statistics (mean and Gram sums) in two scans whose partial aggregates
  * are map-side combinable; driver state is the dim×dim Gram (64×64
  * doubles here — the same bounded-model-state shape as the kmeans
  * centroids and classifier weights). Power iteration runs on the driver
  * over that matrix; the per-row work never leaves the executors.
  * Projection is scan-local with the loadings inlined as literals.
  * Quantization headroom: Gram terms quantize at 1e-6, so the BIGINT
  * sums stay exact up to ~9e12 rows × O(1) feature scale — past the
  * ~4e11 vectors of a 100 TB float32 corpus.
  */
object Pca {

  /** A fitted model: per-dimension means, `loadings(k)(j)` for component
    * k, and the per-component eigenvalue (the final iterate's ‖Gv‖).
    */
  final case class Model(means: Array[Double], loadings: Array[Array[Double]],
      eigenvalues: Array[Double])

  private val QStat = 1000000.0      // mean/Gram term grid (overflow headroom)
  private val QVec = 1000000000.0    // iterate/projection term grid

  /** Fit by fixed-step power iteration with deflation. `vecs` must carry
    * an array&lt;float|double&gt; column `vecCol` of constant length `dim`.
    */
  def fit(vecs: DataFrame, vecCol: String, dim: Int, components: Int,
      steps: Int): Model = {
    require(dim >= 1 && components >= 1 && components <= dim && steps >= 1,
      s"bad pca shape: dim=$dim components=$components steps=$steps")
    val coord = vecs.select(posexplode(col(vecCol))).select(
      col("pos").as("j"), col("col").cast("double").as("x"))
    val mrows = coord.groupBy("j")
      .agg(sum(floor(col("x") * lit(QStat))).as("sq"), count(lit(1)).as("n"))
      .collect()
    require(mrows.length == dim, s"expected $dim dims, saw ${mrows.length}")
    val n = mrows.head.getLong(2)
    val means = new Array[Double](dim)
    mrows.foreach(r => means(r.getInt(0)) = r.getLong(1).toDouble / QStat / n)

    // centered Gram sums: one scan, dim² quantized-BIGINT keys — the
    // flattened (i,j) term array explodes map-side and collapses in the
    // partial aggregate, so the exchange carries dim²×partitions longs
    val mArr = array(means.map(lit): _*)
    val termArr = transform(sequence(lit(0), lit(dim * dim - 1)), { t =>
      val i = (t / dim).cast("int")
      val j = (t % dim).cast("int")
      val ci = element_at(col(vecCol), i + 1).cast("double") - element_at(mArr, i + 1)
      val cj = element_at(col(vecCol), j + 1).cast("double") - element_at(mArr, j + 1)
      floor(ci * cj * lit(QStat))
    })
    val grows = vecs.select(posexplode(termArr)).select(
      col("pos").as("t"), col("col").as("term"))
      .groupBy("t").agg(sum("term").as("sq")).collect()
    val g = Array.ofDim[Double](dim, dim)
    grows.foreach { r =>
      val tt = r.getInt(0); g(tt / dim)(tt % dim) = r.getLong(1).toDouble / QStat / n
    }

    // driver-side fixed-step power iteration + deflation — every float op
    // below is mirrored operation-for-operation by the oracle's CTE chain
    val loadings = Array.ofDim[Array[Double]](components)
    val eigs = new Array[Double](components)
    for (c <- 0 until components) {
      var v = Array.fill(dim)(0.125) // exact binary double, any non-orthogonal seed works
      var lam = 0.0
      for (_ <- 0 until steps) {
        val wq = Array.tabulate(dim) { i =>
          var acc = 0L
          var j = 0
          while (j < dim) { acc += math.floor(g(i)(j) * v(j) * QVec).toLong; j += 1 }
          acc
        }
        val w = wq.map(_.toDouble / QVec)
        val nq = w.foldLeft(0L)((a, x) => a + math.floor(x * x * QVec).toLong)
        lam = math.sqrt(nq.toDouble / QVec)
        require(lam > 0.0, "degenerate (zero-variance) corpus: power iterate vanished")
        v = w.map(x => math.floor(x / lam * QVec) / QVec)
      }
      loadings(c) = v
      eigs(c) = lam
      // deflate: G ← G − λ v vᵀ (quantized), so the next component finds
      // the leading direction of the residual
      for (i <- 0 until dim; j <- 0 until dim)
        g(i)(j) = g(i)(j) - math.floor(lam * v(i) * v(j) * QVec) / QVec
    }
    Model(means, loadings, eigs)
  }

  /** The projection columns for a fitted model: `pc1..pcK`, each the
    * 1e-9-grid quantized-BIGINT sum of centered coordinate × loading —
    * scan-local, zero shuffle, exactly replayable in SQL.
    */
  def projectCols(model: Model, vecCol: String): Seq[Column] = {
    val mArr = array(model.means.map(lit): _*)
    model.loadings.zipWithIndex.map { case (load, k) =>
      val lArr = array(load.map(lit): _*)
      val centered = zip_with(col(vecCol), mArr, (x, m) => x.cast("double") - m)
      val terms = zip_with(centered, lArr, (cv, w) => floor(cv * w * lit(QVec)))
      (aggregate(terms, lit(0L), (acc, x) => acc + x).cast("double") / lit(QVec))
        .as(s"pc${k + 1}")
    }.toSeq
  }
}

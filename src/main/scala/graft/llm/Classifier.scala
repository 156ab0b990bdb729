package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained linear quality classifier — the GPT-3-style curation move:
  * instead of (or alongside) hand-thresholded gates, TRAIN a cheap model
  * on labeled examples and score every document with it at scan speed.
  * Here the model is logistic regression fit by a FIXED number of
  * full-batch gradient steps, which keeps the whole fit inside the
  * engine's determinism contract:
  *
  *   - each step's gradient is one map-side-combinable aggregate over the
  *     feature frame — sum of `(σ(w·x) − y)·x_j` per feature — with every
  *     per-row term floor-quantized to 1e-9 and summed as exact BIGINTs,
  *     so the sum is independent of partitioning AND engine (float `+` is
  *     order-sensitive; integer `+` is not — the same trick as the
  *     mixture-weight sqrt-sum);
  *   - weights are floor-quantized to 1e-6 after every step, so a 1-ulp
  *     `exp` difference between libm implementations cannot compound
  *     across steps;
  *   - the step count is fixed, not convergence-tested, so both engines
  *     run the identical computation (the DuckDB oracle unrolls the same
  *     steps as CTEs and lands on bit-identical weights).
  *
  * Scale shape: driver state is d+1 doubles; each step is one scan of a
  * persisted narrow stats frame (K scans total). At 100 TB the identical
  * layout applies — materialize the per-doc feature table once, run K
  * aggregate passes — and the per-step aggregate shuffles d+2 longs per
  * partition, nothing per-row. More steps or second-order methods ride
  * the same sufficient-statistic shape.
  */
object Classifier {

  /** One fixed-step full-batch logistic-regression fit. Returns the
    * weight vector with the bias FIRST, then one weight per entry of
    * `featureCols` in order. `labelCol` must be 0.0/1.0 doubles.
    */
  def trainLogistic(feats: DataFrame, featureCols: Seq[String],
      labelCol: String, steps: Int, lr: Double): Array[Double] = {
    require(steps > 0, s"steps must be positive, got $steps")
    val cached = feats.persist()
    try {
      var w = Array.fill(featureCols.length + 1)(0.0)
      for (_ <- 0 until steps) {
        // z built bias-first, left-to-right — the oracle writes the same
        // association, so the float sum is bit-identical
        val z = featureCols.zipWithIndex.foldLeft(lit(w(0)): Column) {
          case (acc, (f, j)) => acc + lit(w(j + 1)) * col(f)
        }
        val p = lit(1.0) / (lit(1.0) + exp(-z))
        val diff = p - col(labelCol)
        val xs = lit(1.0) +: featureCols.map(col)
        val grads = xs.zipWithIndex.map { case (x, j) =>
          sum(floor(diff * x * lit(1000000000.0)).cast("long")).as(s"g$j")
        }
        val row = cached.agg(count(lit(1)).as("n"), grads: _*).collect()(0)
        val n = row.getLong(0)
        w = w.indices.map { j =>
          val g = row.getLong(j + 1).toDouble / 1000000000.0 / n
          math.floor((w(j) - lr * g) * 1000000.0) / 1000000.0
        }.toArray
      }
      w
    } finally { cached.unpersist(); () }
  }

  /** The scoring projection for a trained weight vector (bias first):
    * quantized sigmoid score + the ≥ 0.5 keep decision. Scan-local.
    */
  def scoreCols(weights: Seq[Double], featureCols: Seq[String]): (Column, Column) = {
    require(weights.length == featureCols.length + 1,
      s"${featureCols.length + 1} weights expected, got ${weights.length}")
    val z = featureCols.zipWithIndex.foldLeft(lit(weights(0)): Column) {
      case (acc, (f, j)) => acc + lit(weights(j + 1)) * col(f)
    }
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    val score = floor(p * lit(1000000.0)) / lit(1000000.0)
    (score, score >= lit(0.5))
  }
}

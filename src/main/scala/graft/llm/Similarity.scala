package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  private def spread(df: DataFrame): DataFrame = Spread(df)

  /** ⌈√n⌉ centroid sizing without a dedicated scan per query. Size comes
    * from, in order: the caller (a memoized [[graft.Tables.rowCount]], a
    * manifest), the optimized plan's row-count statistics (a
    * [[graft.sources.Catalog.registerParquet]]-registered + ANALYZE'd table
    * carries them via `spark.sql.cbo.planStats.enabled` — zero jobs), and
    * only as the no-information fallback an inline `count()` — at 100 TB a
    * per-query count is an extra full-metadata pass just to size K.
    */
  private def adaptiveCentroids(embeddings: DataFrame, n: Option[Long]): Int = {
    val known = n.orElse(
      embeddings.queryExecution.optimizedPlan.stats.rowCount.map(_.toLong))
    math.max(1, math.ceil(math.sqrt(
      known.getOrElse(embeddings.count()).toDouble)).toInt)
  }

  /** Exact decimal-accumulated dot product of two array<float/double> cols,
    * as double. Native codegen'd expression ([[DotDecimal]]) — bit-identical
    * to the declarative `aggregate(zip_with(...decimal(28,12)...))` form it
    * replaces, but a single fused loop instead of per-element interpreted
    * lambdas with boxed Decimals.
    */
  def dotDec(a: Column, b: Column): Column = DotDecExpr.dotDecimal(a, b)

  /** Exact squared L2 norm (decimal-accumulated), as double. */
  def norm2(v: Column): Column = dotDec(v, v).cast("double")

  /** Unit-normalize an embedding column (decimal-exact norm, one double
    * divide per element) — the standard preprocessing that turns cosine
    * into a plain dot product for every downstream ANN stage. Zero vectors
    * stay zero via the tiny-norm guard (identical in the SQL oracle).
    * Output is (id, unit array<double>, norm double); [[l2NormalizeFlat]]
    * is the exploded (id, pos, value) form the element-exact oracle
    * compares.
    *
    * The norm column is part of the OUTPUT on purpose: callers usually
    * want it anyway, and the second reference is what stops
    * CollapseProject from re-inlining the O(dim) norm into the transform
    * lambda — a single-referenced alias gets collapsed back regardless of
    * cost, and the norm would then re-run per ELEMENT (verified against
    * this Spark's optimizer; same idiom as [[Quantize.withInt8]]).
    */
  def l2Normalize(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame =
    embeddings
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"),
        sqrt(greatest(norm2(col(vecCol)), lit(1e-300))).as("__d"))
      .select(col(idCol),
        transform(col("__v"), x => x / col("__d")).as("unit"),
        // report the TRUE norm: the guard floor (1e-150) exists only to
        // keep the division defined; a zero vector's norm is 0.0. (This is
        // still the second __d reference that prevents the collapse.)
        when(col("__d") <= lit(1e-150), lit(0.0)).otherwise(col("__d")).as("norm"))

  /** [[l2Normalize]] exploded to one row per element — scalar doubles
    * compare EXACTLY in the verification harness, where an array column
    * would be compared through its string rendering (≈8 digits). The
    * Generate (posexplode) between the norm projection and the division
    * is an optimizer barrier, so the norm computes once per ROW here too.
    */
  def l2NormalizeFlat(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame =
    embeddings
      .select(col(idCol), posexplode(col(vecCol).cast("array<double>")),
        sqrt(greatest(norm2(col(vecCol)), lit(1e-300))).as("__d"))
      .select(col(idCol), (col("pos") + 1).cast("int").as("pos"),
        (col("col") / col("__d")).as("value"))

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
    val corpus = spread(embeddings)
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

  /** Deterministic ±1 hyperplane entry for sign-LSH binary codes: the
    * sign is the top bit of sha256("hp:j:i") — a rule both engines can
    * evaluate (the oracle reads it as "first hex char < '8'"), so the
    * random hyperplanes need no seed-synchronized RNG.
    */
  private[graft] def hyperplaneSign(j: Int, i: Int): Double = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"hp:$j:$i".getBytes("UTF-8"))
    if ((d(0) & 0x80) == 0) 1.0 else -1.0
  }

  /** 64-bit sign-LSH binary codes over an embedding column — the 32×
    * compression layer of a retrieval stack: bit j is the sign of the
    * vector's projection onto deterministic hyperplane j (random
    * hyperplane LSH, Charikar 2002), so hamming distance estimates
    * angular distance and the codes feed the same banded hamming join
    * as SimHash/dHash ([[SimHash.hammingPairsOn]]).
    *
    * Projections use the decimal-exact dot ([[dotDec]]), so every bit —
    * hence every code — is association- and engine-independent. Shape:
    * hyperplanes are 64 broadcast rows; the 64× expansion collapses
    * map-side (partial sum per vector before the exchange), so the
    * shuffle carries one row per vector.
    */
  def binaryCodes(embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val planes = (0 until 64).map { j =>
      (j, (0 until dim).map(i => hyperplaneSign(j, i)), 1L << (63 - j))
    }
    val hp = planes.toDF("j", "hv", "w")
    spread(embeddings)
      .select(col(idCol).as("vec_id"), col(vecCol).as("__v"))
      .crossJoin(broadcast(hp))
      .select(col("vec_id"), col("w"),
        (dotDec(col("__v"), col("hv")).cast("double") > lit(0.0)).as("__bit"))
      .groupBy(col("vec_id"))
      .agg(sum(when(col("__bit"), col("w")).otherwise(lit(0L))).as("code64"))
  }

  /** kNN label classification over the embedding space: each query
    * vector takes the majority label of its k nearest corpus neighbors
    * (exact cosine, self excluded), ties broken toward the smaller
    * label — the standard embedding-quality probe ("do labels cluster?")
    * and a label-propagation primitive for weakly-labeled corpora.
    * Output: `(query_id, true_label, pred_label, n_votes, correct)`.
    *
    * Scale shape: rides [[cosineTopK]] (broadcast queries, scan-local
    * scoring); the vote join broadcasts the queries×k result against the
    * corpus label projection, so nothing corpus-scale shuffles.
    */
  def knnLabel(embeddings: DataFrame, idCol: String, vecCol: String,
      labelCol: String, isQuery: Column, k: Int): DataFrame = {
    val topk = cosineTopK(embeddings, idCol, vecCol, isQuery, k)
    val labels = embeddings.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("__nl"))
    val votes = broadcast(topk).join(labels, Seq("neighbor_id"))
      .groupBy(col("query_id"), col("__nl"))
      .agg(count(lit(1)).as("n_votes"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("n_votes").desc, col("__nl").asc)
    val pred = votes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("query_id"), col("__nl").as("pred_label"), col("n_votes"))
    embeddings.filter(isQuery)
      .select(col(idCol).as("query_id"), col(labelCol).as("true_label"))
      .join(pred, Seq("query_id"))
      .withColumn("correct", col("pred_label") === col("true_label"))
  }

  /** Semantic decontamination: flag corpus vectors whose cosine against
    * ANY eval-set vector reaches `threshold` — the embedding-space
    * complement of the n-gram decontamination in
    * [[TextOps.decontaminate]], catching paraphrased benchmark leakage
    * exact gram overlap misses. Output one row per contaminated corpus
    * id: `(<idCol>, n_hits, max_cos)`.
    *
    * Scale shape: the eval slice is benchmark-sized and broadcast; the
    * corpus side is one scan-local pass (broadcast nested-loop against
    * |eval| rows, no shuffle until the per-id rollup, which is
    * hit-bounded). Cosines are decimal-exact ([[dotDec]]) so the
    * threshold decision is bit-identical cross-engine; `max_cos` is a
    * max, not a sum — order-independent by construction.
    */
  def semanticDecon(embeddings: DataFrame, idCol: String, vecCol: String,
      isEval: Column, threshold: Double): DataFrame = {
    val n2 = embeddings.select(col(idCol), col(vecCol).as("__v"),
      norm2(col(vecCol)).as("__nn"))
    val eval_ = n2.filter(isEval)
      .select(col(idCol).as("__eid"), col("__v").as("__ev"),
        col("__nn").as("__en"))
    val cos = dotDec(col("__v"), col("__ev")).cast("double") /
      (sqrt(col("__nn")) * sqrt(col("__en")))
    n2.filter(!isEval)
      .crossJoin(broadcast(eval_))
      .withColumn("cosine", cos)
      .filter(col("cosine") >= threshold)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"), max(col("cosine")).as("max_cos"))
  }

  /** Embedding-cosine near-duplicate pairs: candidates are blocked by IVF
    * centroid AND a caller-supplied blocking column (e.g. label/language/
    * source), then exact cosine filters at `threshold`.
    *
    * Scale design:
    *   - the centroid count GROWS with the corpus (default ⌈√n⌉, the
    *     standard IVF sizing that keeps expected block size ≈ √n, so the
    *     within-block self-join stays ~O(n) total instead of quadratic; a
    *     fixed K would blow up linearly-per-block at 100× data);
    *   - centroids are the K lowest-id vectors — the deterministic sampled
    *     init (k-means refinement is a drop-in replacement: anything that
    *     yields a (id, vec) frame plugs into [[ivfAssignTo]]);
    *   - oversized (centroid, block) buckets are DROPPED at `blockCap`,
    *     mirroring [[MinHashDedup.candidatePairs]]'s mega-bucket guard — a
    *     degenerate blocking key can never reintroduce the n² join.
    */
  def cosineNearDup(embeddings: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double,
      numCentroids: Option[Int] = None, blockCap: Int = 10000,
      corpusCount: Option[Long] = None,
      assigned: Option[DataFrame] = None): DataFrame = {
    // `assigned` (an [[assignedCorpusShared]] frame whose extraCols include
    // blockCol) skips the assignment pass entirely — the memoized corpus
    // assignment serves every IVF-plane consumer in the session
    val a = assigned.getOrElse {
        val k = numCentroids.getOrElse(adaptiveCentroids(embeddings, corpusCount))
        // TakeOrderedAndProject: K rows to the driver, broadcast back —
        // cheap relative to the corpus scan it prunes
        val centroids = embeddings.orderBy(col(idCol)).limit(k)
        // fused single-scan: (vec, norm, block, assignment) in one pass
        assignedWithVec(embeddings, idCol, vecCol, centroids,
          extraCols = Seq(blockCol))
      }
      .select(col("vec_id").as(idCol), col("__v"),
        col(blockCol).as("__blk"), col("__vn").as("__nn"), col("centroid_id"))
    val okBlocks = a.groupBy("centroid_id", "__blk")
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= blockCap)
      .select("centroid_id", "__blk")
    val gated = a.join(okBlocks, Seq("centroid_id", "__blk"), "left_semi")
    val x = gated.select(col("centroid_id"), col("__blk"),
      col(idCol).as("vec_a"), col("__v").as("__va"), col("__nn").as("__na"))
    val y = gated.select(col("centroid_id"), col("__blk"),
      col(idCol).as("vec_b"), col("__v").as("__vb"), col("__nn").as("__nb"))
    x.join(y, Seq("centroid_id", "__blk"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", dotDec(col("__va"), col("__vb")).cast("double") /
        (sqrt(col("__na")) * sqrt(col("__nb"))))
      .filter(col("cosine") >= threshold)
      .select("vec_a", "vec_b", "cosine")
  }

  /** Block-occupancy audit for [[cosineNearDup]]'s cap gate — the
    * embedding-plane member of the no-silent-caps family
    * (`MinHashDedup.bucketStats`, `SimHash.bandCoverage`,
    * `TextOps.winnowCoverage`): (centroid, block) groups larger than
    * `blockCap` are dropped before the within-block self-join (correct —
    * a degenerate blocking key must never reintroduce the n² join), and
    * this row is where that drop stops being silent. Same
    * corpus-size-invariant schema as the siblings, off the
    * (centroid, block) exchange the gate already pays: block counts by
    * occupancy class, vector mass per class, and `pair_coverage`.
    */
  def blockStats(assigned: DataFrame, blockCol: String,
      blockCap: Int): DataFrame = {
    val per = assigned
      .groupBy(col("centroid_id"), col(blockCol))
      .agg(count(lit(1)).as("n_occ"))
    per.agg(
        count(lit(1)).as("n_blocks"),
        sum(col("n_occ")).as("n_vectors_total"),
        sum(when(col("n_occ") === 1, 1L).otherwise(0L))
          .as("n_blocks_singleton"),
        sum(when(col("n_occ") > blockCap, 1L).otherwise(0L))
          .as("n_blocks_hot"),
        sum(when(col("n_occ") > blockCap, col("n_occ")).otherwise(0L))
          .as("n_vectors_hot"),
        sum(when(col("n_occ").between(2, blockCap), col("n_occ"))
          .otherwise(0L)).as("n_vectors_pairable"))
      .select(col("n_blocks"), col("n_vectors_total"),
        col("n_blocks_singleton"), col("n_blocks_hot"),
        col("n_vectors_hot"), col("n_vectors_pairable"),
        (col("n_vectors_pairable").cast("double") / col("n_vectors_total"))
          .as("pair_coverage"))
  }

  /** Lloyd-refined IVF codebook: start from the deterministic lowest-id
    * sample, run `iters` rounds of assign → per-dimension mean. Returns a
    * (`idCol`, `vecCol`: array<double>) frame that plugs straight into
    * [[ivfAssignTo]]/[[ivfRank]]/[[ivfTopK]] — centroid ids stay the
    * original sampled ids; a centroid that loses all its members drops out
    * (standard Lloyd behavior, deterministic).
    *
    * Exactness: per-dimension means accumulate as DECIMAL(28,12) (exact,
    * order-independent) before one double divide — the refined codebook is
    * bit-reproducible across partitionings and engines, so assignments and
    * downstream top-k cutoffs never flip on a re-run.
    *
    * Scale design: each round is one assignment pass (broadcast centroids,
    * scan-local argmin) plus one mean shuffle. The mean explodes to
    * n×dim rows but groupBy(centroid, dim) SUM is partially aggregated
    * map-side, so the shuffle carries only K×dim×partitions rows. At
    * 100 TB, train the codebook on a sample (pass the sampled frame as
    * `embeddings`) and assign the full corpus with the result — refinement
    * cost is then independent of corpus size.
    */
  def kmeansCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 2): DataFrame =
    // K×dim rows: cache the literal codebook so consumers that read it
    // twice (probe list + corpus assignment) reuse one in-memory copy
    graft.CacheBin.register(
      kmeansCentroidsImpl(embeddings, idCol, vecCol, k, iters).persist())

  /** Session memo for [[kmeansCentroids]], keyed by (session, corpusKey,
    * k, iters): the codebook is MODEL state, not query state — Lloyd
    * training runs once per session and every later probe/assignment
    * reads the same literal centroid table. At 100 TB the equivalent
    * decision is "train on a sample once, persist the codebook, serve
    * every query from it" ([[ivfIndexWrite]] is the on-disk form);
    * retraining per query is the anti-pattern this memo removes. The
    * memoized frame is a LocalRelation (K×dim literal rows), so even
    * after a cache drain re-evaluating it costs no jobs.
    */
  def kmeansCentroidsShared(embeddings: DataFrame, corpusKey: String,
      idCol: String, vecCol: String, k: Int, iters: Int = 2): DataFrame =
    graft.SessionMemo.cached(embeddings.sparkSession,
      s"kmeans:$corpusKey:$idCol:$vecCol:$k:$iters")(
      kmeansCentroidsImpl(embeddings, idCol, vecCol, k, iters))

  private def kmeansCentroidsImpl(embeddings: DataFrame, idCol: String,
      vecCol: String, k: Int, iters: Int): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DecimalType, DoubleType, StructField, StructType}
    import org.apache.spark.sql.Row
    val spark = embeddings.sparkSession
    // centroids are MODEL STATE, bounded at K×dim BY CONSTRUCTION
    // (K = ⌈√n⌉ from the sizing policy; at 1e9 corpus rows and dim 128
    // that's ~32 MB — and the 100 TB path trains on a sample anyway), so
    // hold them on the driver between rounds, MLlib-KMeans style. Each
    // round is then ONE distributed job against a literal centroid table;
    // leaving the rounds lazy instead nests every earlier round's plan
    // into the next broadcast and re-executes it per round.
    val idField = embeddings.schema(idCol)
    val schema = StructType(Seq(idField, StructField(vecCol, ArrayType(DoubleType))))
    def toFrame(rows: Array[Row]): DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    var cent = embeddings.orderBy(col(idCol)).limit(k)
      .select(col(idCol), col(vecCol).cast("array<double>").as(vecCol))
      .collect()
    for (_ <- 1 to iters) {
      // posexplode → per-(centroid, dim) decimal mean → per-centroid array.
      // (A dim-wide column-sum aggregate was A/B'd here and lost: 64
      // decimal accumulator columns compile into a slower aggregate than
      // the narrow exploded one, and the explode's extra shuffle carries
      // only K×dim pre-aggregated rows. At 100 TB, train on a sample.)
      // assignedWithVec keeps the vector through the assignment pass — one
      // corpus scan per round, no join-back.
      cent = exactMeanVectors(
          assignedWithVec(embeddings, idCol, vecCol, toFrame(cent)),
          "centroid_id", "__v", vecCol)
        .select(col("centroid_id").as(idCol), col(vecCol))
        .collect()
    }
    toFrame(cent)
  }

  /** Per-key DECIMAL(28,12)-exact per-dimension mean vectors — the ONE
    * numeric discipline behind every centroid build (Lloyd rounds AND
    * [[labelCoherence]]): posexplode → exact decimal sum / count →
    * position-sorted re-assembly. Order-independent, bit-reproducible
    * across partitionings and engines.
    */
  private def exactMeanVectors(df: DataFrame, keyCol: String,
      vecCol: String, outVec: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    df.select(col(keyCol), posexplode(col(vecCol).cast("array<double>")))
      .groupBy(col(keyCol), col("pos"))
      .agg((sum(col("col").cast(DecimalType(28, 12)))
        .cast("double") / count(lit(1))).as("m"))
      .groupBy(col(keyCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as(outVec))
  }

  /** Materialize an IVF index at `dir`: the corpus (id, vector, norm)
    * written `partitionBy(centroid_id)` — one directory per inverted
    * list — with the codebook alongside at `dir/centroids`. This is the
    * scale path the probed reader ([[ivfTopKFromIndex]]) needs: a probe
    * touches only its bucket DIRECTORIES, so per-query scan cost is
    * nProbe·√n files rather than the corpus. Rebuild (or re-assign
    * incrementally) when the corpus or codebook changes.
    */
  def ivfIndexWrite(embeddings: DataFrame, idCol: String, vecCol: String,
      dir: String, centroids: Option[DataFrame] = None,
      numCentroids: Option[Int] = None, corpusCount: Option[Long] = None,
      assigned: Option[DataFrame] = None): Unit = {
    // as in ivfTopK: don't size (and possibly count) when a codebook is given
    val cf = centroids.getOrElse(
        embeddings.orderBy(col(idCol)).limit(
          numCentroids.getOrElse(adaptiveCentroids(embeddings, corpusCount))))
      .select(col(idCol), col(vecCol).cast("array<double>").as(vecCol))
    val cfCached = graft.CacheBin.register(cf.persist())
    // ONE corpus scan: (vec, norm, nearest centroid) from the fused
    // assignment pass — the former shape scanned the corpus twice (norm
    // pass + ivfAssignTo pass) and joined on vec_id to glue them together.
    // An `assigned` frame (same-codebook contract as ivfTopK) means the
    // write is a repartition of the memoized assignment — zero scans.
    assigned.getOrElse(assignedWithVec(embeddings, idCol, vecCol, cfCached))
      .select(col("vec_id"), col("__v").as("vec"),
        col("__vn").as("norm2"), col("centroid_id"))
      // co-locate each inverted list before the write: without this every
      // write task touches every centroid directory (tasks × K small
      // files); with it a list is one task's contiguous file(s) — the
      // layout the probed reader wants at any scale
      .repartition(col("centroid_id"))
      .write.partitionBy("centroid_id")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$dir/corpus")
    cfCached.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/centroids")
  }

  /** Probed ANN top-k over a materialized index: rank the query set's
    * `nProbe` nearest centroids from the stored codebook, then scan ONLY
    * those inverted lists — the `centroid_id` IN-list is literal, so it
    * prunes at the file-listing level (PartitionFilters on the scan, no
    * touch of unprobed directories). The probe-id collect is bounded by
    * |queries|×nProbe — the query set is broadcast-small by the same
    * contract as [[cosineTopK]].
    */
  def ivfTopKFromIndex(queries: DataFrame, idCol: String, vecCol: String,
      dir: String, k: Int, nProbe: Int): DataFrame = {
    val spark = queries.sparkSession
    val centroids = spark.read.parquet(s"$dir/centroids")
    val cols = centroids.columns
    val (probes, probeIds) = probeSet(queries, idCol, vecCol,
      centroids.select(col(cols(0)).as(idCol), col(cols(1)).as(vecCol)), nProbe)
    val corpus = spark.read.parquet(s"$dir/corpus")
      .filter(col("centroid_id").isin(probeIds: _*))
    probedTopK(queries, idCol, vecCol, corpus, probes, k)
  }

  /** The query side of a probed read: (query_id → probed centroid_id)
    * pairs plus the distinct probe-id list (bounded by |queries|×nProbe).
    */
  private def probeSet(queries: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, nProbe: Int): (DataFrame, IndexedSeq[Any]) = {
    val probes = ivfRank(queries, idCol, vecCol, centroids, nProbe)
      .select(col("vec_id").as("query_id"), col("centroid_id"))
    (probes, probes.select("centroid_id").distinct()
      .collect().map(_.get(0)).toIndexedSeq)
  }

  /** Shared scoring tail of every probed-index reader: exact cosine of
    * each query against its probed inverted lists, ranked to top-k.
    * `corpus` must carry (vec_id, vec, norm2, centroid_id).
    */
  private def probedTopK(queries: DataFrame, idCol: String, vecCol: String,
      corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        norm2(col(vecCol)).as("__qn"))
      .join(probes, Seq("query_id"))
    val joined = corpus.join(broadcast(q), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    joined
      .withColumn("cosine", dotDec(col("__qv"), col("vec")).cast("double") /
        (sqrt(col("__qn")) * sqrt(col("norm2"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cosine"), col("rank"))
  }

  // ------------------------------------------------- maintained IVF index

  /** Append one corpus batch to a commit-log-backed IVF index: assign the
    * batch against the index's FROZEN codebook (re-clustering means a
    * rebuild — the standard IVF maintenance contract) and commit the
    * assigned rows atomically, one inverted list per table partition. The
    * first append creates the table. Daily ingest at 100 TB is exactly
    * this shape: the append scans ONLY the batch, readers stay
    * snapshot-isolated, and [[graft.tables.CommitLogTable.compact]]
    * bin-packs the lists without touching logical content — so
    * fresh-build and incrementally-maintained indexes are
    * result-identical by construction.
    */
  def ivfLogAppend(spark: SparkSession, dir: String, batch: DataFrame,
      idCol: String, vecCol: String, centroids: DataFrame): Long = {
    val assigned = assignedWithVec(batch, idCol, vecCol, centroids)
      .select(col("vec_id"), col("__v").as("vec"),
        col("__vn").as("norm2"), col("centroid_id"))
    val table = graft.tables.CommitLogTable.forPath(spark, dir,
      assigned.schema, Seq("centroid_id"))
    // recordChanges=false: inverted-list rows are derived (assignment of
    // the corpus batch) — the embeddings table owns the change feed
    table.append(assigned, recordChanges = false)
  }

  /** Probed top-k over a commit-log-backed IVF index: identical math to
    * [[ivfTopKFromIndex]]; what changes is that probe pruning happens on
    * the table MANIFEST (a driver-side metadata pass over the snapshot's
    * file list — no directory listings, and concurrent appends/compacts
    * can't perturb the read).
    */
  def ivfTopKFromLog(queries: DataFrame, idCol: String, vecCol: String,
      table: graft.tables.CommitLogTable, centroids: DataFrame, k: Int,
      nProbe: Int): DataFrame = {
    val (probes, probeIds) = probeSet(queries, idCol, vecCol, centroids, nProbe)
    val corpus = table.readPartitions(probeIds.map(String.valueOf).toSet)
    probedTopK(queries, idCol, vecCol, corpus, probes, k)
  }

  /** Nearest-centroid assignment that KEEPS the row's vector and norm
    * (plus `extraCols`) — the fused single-scan form every corpus-side
    * consumer wants: the assignment window computes the norm anyway, so
    * re-scanning the corpus for (vec, norm) and joining on id (the naive
    * shape) costs a second scan and a corpus-wide shuffle join for data
    * this one pass already holds. Output: (vec_id, __v, __vn,
    * centroid_id, extraCols...).
    */
  private def assignedWithVec(embeddings: DataFrame, idCol: String,
      vecCol: String, centroidFrame: DataFrame,
      extraCols: Seq[String] = Nil): DataFrame = {
    val cents = centroidFrame.select(col(idCol).as("centroid_id"),
      col(vecCol).as("__cv"), norm2(col(vecCol)).as("__cn"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("dist2").asc, col("centroid_id").asc)
    spread(embeddings)
      .select(col(idCol).as("vec_id") +: col(vecCol).as("__v") +:
        norm2(col(vecCol)).as("__vn") +: extraCols.map(col): _*)
      .crossJoin(broadcast(cents))
      .withColumn("dist2", col("__vn") + col("__cn") -
        lit(2.0) * dotDec(col("__v"), col("__cv")).cast("double"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("vec_id") +: col("__v") +: col("__vn") +:
        col("centroid_id") +: extraCols.map(col): _*)
  }

  /** Session-memoized fused corpus assignment (vec_id, __v, __vn,
    * centroid_id, extraCols) against `centroidFrame` — the in-session
    * twin of the materialized index: the corpus-×-codebook assignment
    * pass runs ONCE and every IVF-plane consumer (probed top-k corpus
    * side, near-dup blocking, the index write itself) reads the same
    * frame. At 100 TB the equivalent decision is "the assignment IS the
    * index — materialize it once, serve every query from it"
    * ([[ivfIndexWrite]] is the on-disk form). `codebookKey` names the
    * codebook identity (the frame itself can't key a map); callers must
    * keep key and frame in sync — same contract as every memo here.
    */
  def assignedCorpusShared(embeddings: DataFrame, corpusKey: String,
      idCol: String, vecCol: String, centroidFrame: DataFrame,
      codebookKey: String, extraCols: Seq[String] = Nil): DataFrame =
    graft.SessionMemo.cached(embeddings.sparkSession,
      s"ivfassigned:$corpusKey:$idCol:$vecCol:$codebookKey:${extraCols.mkString(",")}")(
      assignedWithVec(embeddings, idCol, vecCol, centroidFrame, extraCols))

  /** IVF coarse assignment: nearest centroid (squared L2) per vector.
    * Centroids are broadcast; ties break to the lowest centroid id.
    */
  def ivfAssign(embeddings: DataFrame, idCol: String, vecCol: String,
      isCentroid: Column): DataFrame =
    ivfAssignTo(embeddings, idCol, vecCol, embeddings.filter(isCentroid))

  /** IVF assignment against an explicit centroid frame (`idCol`, `vecCol`)
    * — sampled ids, k-means output, or any externally-built codebook.
    */
  def ivfAssignTo(embeddings: DataFrame, idCol: String, vecCol: String,
      centroidFrame: DataFrame): DataFrame =
    ivfRank(embeddings, idCol, vecCol, centroidFrame, 1)
      .select(col("vec_id"), col("centroid_id"), col("dist2"))

  /** The `nRank` nearest centroids per vector (probe lists). Centroids are
    * broadcast; the `WindowGroupLimit` rank-limit applies map-side, so the
    * shuffle carries ≤ nRank×partitions rows per vector, not all K.
    */
  def ivfRank(embeddings: DataFrame, idCol: String, vecCol: String,
      centroidFrame: DataFrame, nRank: Int): DataFrame = {
    val centroids = centroidFrame
      .select(col(idCol).as("centroid_id"), col(vecCol).as("__cv"),
        norm2(col(vecCol)).as("__cn"))
    val joined = spread(embeddings)
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
      .filter(col("__rn") <= nRank)
      .select(col("vec_id_").as("vec_id"), col("centroid_id"), col("dist2"),
        col("__rn").as("probe_rank"))
  }

  /** IVF-probed approximate top-k — the ANN scale path: each query scans
    * ONLY the corpus buckets of its `nProbe` nearest centroids instead of
    * the whole corpus. Centroid count defaults to ⌈√n⌉ (lowest-id sampled
    * init, as in [[cosineNearDup]]), so expected bucket size is √n and
    * per-query work is nProbe·√n versus n for [[cosineTopK]].
    *
    * At scale the corpus side is a join keyed on `centroid_id` — write the
    * assignment bucketed/partitioned by centroid and the probe join prunes
    * to the touched buckets; the (small) query×probe side broadcasts.
    * Recall is the standard IVF trade: a true neighbor outside every probed
    * bucket is missed.
    */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      isQuery: Column, k: Int, nProbe: Int,
      numCentroids: Option[Int] = None,
      corpusCount: Option[Long] = None,
      centroids: Option[DataFrame] = None,
      assigned: Option[DataFrame] = None): DataFrame = {
    // size ONLY when no codebook is supplied — adaptiveCentroids' fallback
    // is a count job, and an explicit-codebook caller must never pay it
    val centroidFrame = centroids.getOrElse(
      embeddings.orderBy(col(idCol)).limit(
        numCentroids.getOrElse(adaptiveCentroids(embeddings, corpusCount))))
    // fused single-scan corpus side: (vec, norm, assignment) in one pass —
    // no second corpus scan, no corpus-wide join back on id. An `assigned`
    // frame (memoized corpus assignment against the SAME codebook — caller
    // contract) skips even that one pass.
    val corpus = assigned.getOrElse(
        assignedWithVec(embeddings, idCol, vecCol, centroidFrame))
      .select(col("vec_id").as("neighbor_id"), col("__v").as("__nv"),
        col("__vn").as("__nn"), col("centroid_id"))
    val probes = ivfRank(embeddings.filter(isQuery), idCol, vecCol,
        centroidFrame, nProbe)
      .select(col("vec_id").as("query_id"), col("centroid_id"))
    val queries = embeddings.filter(isQuery)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        norm2(col(vecCol)).as("__qn"))
      .join(probes, Seq("query_id"))
    val joined = corpus.join(broadcast(queries), Seq("centroid_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    joined
      .withColumn("cosine", dotDec(col("__qv"), col("__nv")).cast("double") /
        (sqrt(col("__qn")) * sqrt(col("__nn"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Embedding drift between two corpus snapshots: per-label decimal-exact
    * centroids computed for the `isNew=false` and `isNew=true` slices,
    * joined per label with the exact squared-L2 shift between them — the
    * batch-over-batch monitor that catches an embedding-model change,
    * pipeline regression, or topical drift BEFORE the new batch poisons a
    * mixture (labelCoherence says "labels cohere now"; this says "the
    * same label moved").
    *
    * Deterministic: means accumulate DECIMAL(28,12) per dimension (the
    * [[kmeansCentroids]] discipline); drift² accumulates the squared
    * per-dimension deltas the same way. Scale shape: one corpus scan into
    * the posexplode mean aggregate (shuffle = 2L×dim pre-aggregated
    * rows), then an L-row join — nothing corpus-sized moves.
    */
  def labelDrift(embeddings: DataFrame, idCol: String, vecCol: String,
      labelCol: String, isNew: Column): DataFrame = {
    val flagged = embeddings.select(
      col(labelCol).cast("long").as("__lbl"),
      isNew.cast("int").cast("long").as("__snap"), col(vecCol))
    // persisted: the old/new filters each read the centroid table and
    // the count rollup — without the persists the posexplode centroid
    // pass (and the corpus count scan) would run once per snapshot side
    val cents = graft.CacheBin.register(exactMeanVectors(
      flagged.withColumn("__k", col("__lbl") * 2 + col("__snap")),
      "__k", vecCol, "cv")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val counts = graft.CacheBin.register(flagged
      .groupBy(col("__lbl"), col("__snap"))
      .agg(count(lit(1)).as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val oldC = cents.filter(col("__k") % 2 === 0)
      .select((col("__k") / 2).cast("long").as("label"), col("cv").as("__co"))
    val newC = cents.filter(col("__k") % 2 === 1)
      .select(((col("__k") - 1) / 2).cast("long").as("label"), col("cv").as("__cn"))
    // drift² through the decimal-exact dot kernel: per-dimension double
    // subtraction is the identical IEEE op in both engines, the squared
    // deltas then accumulate as DECIMAL(28,12) exactly like every dot
    // product here (a plain SQL aggregate() widens the accumulator to
    // DECIMAL(29,12) and fails to resolve)
    val diff = expr("zip_with(__co, __cn, (x, y) -> x - y)")
    val drift2 = dotDec(diff, diff).cast("double")
    oldC.join(newC, Seq("label"))
      .join(counts.filter(col("__snap") === 0)
        .select(col("__lbl").as("label"), col("__n").as("n_old")), Seq("label"))
      .join(counts.filter(col("__snap") === 1)
        .select(col("__lbl").as("label"), col("__n").as("n_new")), Seq("label"))
      .select(col("label"), col("n_old"), col("n_new"), drift2.as("drift2"))
  }

  /** Embedding-space label coherence: per-label decimal-exact centroids,
    * every vector re-assigned to its nearest label centroid, rolled up as
    * a confusion table `(label, predicted_label, n)` — the cluster-purity
    * audit a training pipeline runs to catch mislabeled or drifted
    * embedding batches before they poison a mixture (diagonal mass =
    * labels that cohere in embedding space; off-diagonal cells name the
    * confusable label pairs).
    *
    * Deterministic end to end: DECIMAL(28,12)-exact per-dimension means
    * (order-independent, the [[kmeansCentroids]] discipline), squared-L2
    * assignment with ties to the lowest label. Scale shape: centroid
    * build is one posexplode aggregate (shuffle = L×dim pre-aggregated
    * rows); assignment broadcasts the L-row codebook against one corpus
    * scan (map-side `WindowGroupLimit` keeps the rank-1 shuffle at one
    * row per vector); the confusion rollup is an L² result.
    */
  def labelCoherence(embeddings: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val cents = exactMeanVectors(
        embeddings.select(col(labelCol).cast("long").as("__lbl"), col(vecCol)),
        "__lbl", vecCol, vecCol)
      .select(col("__lbl").as(idCol), col(vecCol))
    assignedWithVec(embeddings, idCol, vecCol, cents,
        extraCols = Seq(labelCol))
      .groupBy(col(labelCol).cast("long").as("label"),
        col("centroid_id").as("predicted_label"))
      .agg(count(lit(1)).as("n"))
  }
}

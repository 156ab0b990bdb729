package graft.llm

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection over a text column.
  *
  * Pipeline: char-k-shingles → one sha256 per shingle → H minhash
  * signatures (disjoint 8-hex-char slices of the digest, min per slice) →
  * LSH banding (one band per signature row) → bucket join for candidate
  * pairs → exact shingle-Jaccard verification of candidates.
  *
  * Scale design:
  *   - ONE digest per (doc, shingle); the H signature slices reuse it, so
  *     hashing cost is O(total shingles), not O(H × shingles);
  *   - candidate generation is a self-join ONLY within LSH buckets, with
  *     mega-buckets (> bucketCap docs) dropped — the standard guard that
  *     keeps worst-case pair counts linear instead of quadratic when a
  *     common min-shingle floods one bucket;
  *   - Jaccard verification joins shingle sets only for surviving candidate
  *     pairs (tiny compared to the corpus).
  */
object MinHashDedup {

  val numHashes = 8

  /** MinHash signature per document: columns m0..m7 (8-hex-char strings). */
  def signatures(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val shingles = TextOps.charShingles(docs, idCol, textCol, k)
      .withColumn("__h", sha2(col("shingle"), 256))
    val slices = (0 until numHashes).map(i =>
      min(substring(col("__h"), 1 + 8 * i, 8)).as(s"m$i"))
    shingles.groupBy(col(idCol)).agg(slices.head, slices.tail: _*)
  }

  /** Candidate near-dup pairs (idCol_a < idCol_b) sharing at least one LSH
    * bucket, skipping buckets larger than `bucketCap`.
    */
  def candidatePairs(sigs: DataFrame, idCol: String, bucketCap: Int): DataFrame = {
    val bands = sigs.select(
      col(idCol),
      explode(array((0 until numHashes).map(i =>
        struct(lit(i).as("band"), col(s"m$i").as("sig"))): _*)).as("b"))
      .select(col(idCol), col("b.band").as("band"), col("b.sig").as("sig"))
    val okBuckets = bands.groupBy("band", "sig").count()
      .filter(col("count") >= 2 && col("count") <= bucketCap)
      .select("band", "sig")
    val inOk = bands.join(okBuckets, Seq("band", "sig"))
    inOk.as("a").join(inOk.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()
  }

  /** Exact shingle-Jaccard for each candidate pair. */
  def verifiedPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, bucketCap: Int): DataFrame = {
    val shingles = TextOps.charShingles(docs, idCol, textCol, k)
    val counts = shingles.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val pairs = candidatePairs(signatures(docs, idCol, textCol, k), idCol, bucketCap)
    // equi-join on (doc, shingle) both sides — never materializes the
    // per-pair shingle cross product
    val sa = shingles.withColumnRenamed(idCol, "doc_a")
    val sb = shingles.withColumnRenamed(idCol, "doc_b")
    val inter = pairs.join(sa, Seq("doc_a")).join(sb, Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_inter"))
    pairs
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(counts.withColumnRenamed(idCol, "doc_a").withColumnRenamed("n_sh", "n_a"), Seq("doc_a"))
      .join(counts.withColumnRenamed(idCol, "doc_b").withColumnRenamed("n_sh", "n_b"), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
          .as("jaccard"))
  }
}

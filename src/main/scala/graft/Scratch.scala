package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.{MinHashDedup, MinHashExpr, TextOps}
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    val docs = Tables.documents(spark, sfDir)
    t("docs.count")(docs.count())
    val spread = docs.repartition(32)
    t("sig-pass")(spread.select(col("doc_id"),
      MinHashExpr.minhashSlices(col("text"), 16, 8).as("mh")).filter(col("mh").isNotNull).count())
    t("sig-pass2")(spread.select(col("doc_id"),
      MinHashExpr.minhashSlices(col("text"), 16, 8).as("mh")).filter(col("mh").isNotNull).count())
    val sigs = spread.select(col("doc_id") +: (0 until 8).map(i =>
      MinHashExpr.minhashSlices(col("text"), 16, 8).getItem(i).as(s"m$i")): _*)
    t("candidates")(MinHashDedup.candidatePairs(
      spread.select(col("doc_id"), MinHashExpr.minhashSlices(col("text"), 16, 8).as("__mh"))
        .filter(col("__mh").isNotNull)
        .select(col("doc_id") +: (0 until 8).map(i => col("__mh").getItem(i).as(s"m$i")): _*),
      "doc_id", 50).count())
    t("shingle-explode")(TextOps.charShingles(spread, "doc_id", "text", 16, distinct = false).count())
    t("full")(Queries.minhashPairs(spark, sfDir).count())
    t("full2")(Queries.minhashPairs(spark, sfDir).count())
    spark.stop()
  }
}

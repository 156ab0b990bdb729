package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Misra–Gries heavy-hitter sketch (Misra & Gries 1982, "Finding repeated
  * elements"; merge rule from Agarwal et al. 2012, "Mergeable summaries").
  *
  * The buffer holds at most `k` (item, count) entries. Update: increment a
  * resident item; insert when there is room; otherwise decrement every
  * count and evict zeros (the incoming item is absorbed by the decrement).
  * Merge: sum counts, then subtract the (k+1)-th largest total from every
  * entry and drop the non-positive remainder — after which at most k
  * survive.
  *
  * GUARANTEE: any item whose true frequency exceeds n/k (n = stream
  * length) is present in the final sketch, under ANY partitioning and
  * merge order. Counts are lower bounds and ARE order-dependent, so the
  * sketch output itself is not oracle-comparable — consumers must confirm
  * candidates exactly (see [[HeavyHitters.heavyHitterTokens]]), after
  * which the answer is deterministic and exact.
  *
  * Scale shape: each partial buffer carries at most k entries, so the
  * global aggregate moves O(k · partitions) bytes instead of one row per
  * distinct token — at 100 TB that is the difference between shuffling
  * billions of distinct grams to count them and shipping a few KB per
  * task, with the exact pass then touching only the candidate sliver.
  */
case class MisraGriesSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"sketch size k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("lb", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      buf.get(s) match {
        case Some(c) => buf(s) = c + 1L
        case None if buf.size < k =>
          // clone: the input UTF8String may point into a reused row buffer
          buf(s.clone()) = 1L
        case None =>
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.mapValuesInPlace { (key, c) =>
            if (c == 1L) dead += key
            c - 1L
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (key, c) =>
      // keys from deserialize own their bytes — no clone needed
      buf(key) = buf.getOrElse(key, 0L) + c
    }
    if (buf.size > k) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - 1 - k) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.mapValuesInPlace { (key, c) =>
        if (c <= cut) dead += key
        c - cut
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    // deterministic order WITHIN a given buffer (count desc, item asc);
    // the buffer itself is merge-order-dependent — see class doc
    val entries = buf.toArray.sortWith { case ((ia, ca), (ib, cb)) =>
      if (ca != cb) ca > cb else ia.compareTo(ib) < 0
    }
    new GenericArrayData(entries.map { case (item, c) =>
      new GenericInternalRow(Array[Any](item, c))
    })
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val kb = key.getBytes
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(c)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(stored: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(stored))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      buf(UTF8String.fromBytes(kb)) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesSketch =
    copy(child = newChild)
  override def prettyName: String = "misra_gries"
}

/** Heavy-hitter discovery over token streams: sketch pass + exact confirm. */
object HeavyHitters {

  /** The Misra–Gries sketch as an aggregate Column:
    * `array<struct<item:string, lb:bigint>>` of at most k candidates.
    */
  def misraGries(c: Column, k: Int): Column =
    toColumn(MisraGriesSketch(toExpression(c), k).toAggregateExpression())

  /** Exact heavy-hitter tokens: every whitespace token whose occurrence
    * count is at least ⌈phi · n⌉ (n = total token count), with exact
    * counts and corpus share.
    *
    * Two passes over the token stream, neither a full-vocabulary shuffle:
    *  1. one fused global aggregate computes the MG sketch AND the exact
    *     total n (buffers ≤ k entries — O(k · partitions) moved);
    *  2. the exact pass counts ONLY tokens in the candidate set (≤ k rows,
    *     broadcast), so the confirm hash-agg is candidate-sized.
    *
    * `k · phi > 1` is required: the MG guarantee (true count > n/k ⇒ in
    * sketch) then covers every item at the ⌈phi·n⌉ threshold, making the
    * confirmed result EXACT — identical to a full GROUP BY + HAVING, which
    * is what the DuckDB oracle runs.
    */
  def heavyHitterTokens(docs: DataFrame, textCol: String, phi: Double,
      k: Int): DataFrame = {
    require(phi > 0.0 && phi < 1.0, s"phi must be in (0,1), got $phi")
    require(k * phi > 1.0,
      s"MG guarantee needs k > 1/phi (k=$k, phi=$phi): items at the " +
        "threshold could otherwise be evicted and the result would not be exact")
    val toks = docs.select(explode(TextOps.tokens(col(textCol))).as("token"))
    // pass 1: sketch + exact stream length, one scan
    val sketch = toks.agg(
      misraGries(col("token"), k).as("cand"),
      count(lit(1)).as("total"))
    val cands = sketch.select(col("total"),
      explode(col("cand")).as("c")).select(col("c.item").as("token"), col("total"))
    // pass 2: exact counts for the candidate sliver only
    toks.join(broadcast(cands), Seq("token"))
      .groupBy(col("token"), col("total"))
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") >=
        ceil(lit(phi) * col("total")).cast("long"))
      .select(col("token"), col("n_occurrences"),
        (col("n_occurrences").cast("double") / col("total")).as("share"))
  }
}

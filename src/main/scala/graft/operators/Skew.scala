package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — the explicit tool for when AQE's
  * skew-join splitting can't help (both sides of the hot key too large for
  * a broadcast, e.g. a celebrity symbol or null-heavy key at 100 TB).
  *
  * Salting trades a `saltFactor`× replication of the SMALL side for
  * splitting each hot key of the BIG side across `saltFactor` reducers.
  * The join result is identical to the unsalted join; only the partition
  * placement changes. Prefer, in order: broadcast (small dim) → AQE skew
  * join (on by default) → salting (this).
  */
object Skew {

  /** Join types under which salting is sound: the replicated (small) side
    * must be the NON-preserved side, or its unmatched rows would be
    * emitted once per salt value. "right"/"full"/"right_outer" are
    * therefore rejected — flip the join around instead.
    */
  private val soundJoinTypes =
    Set("inner", "left", "left_outer", "left_semi", "left_anti", "cross")

  /** Equi-join `big ⋈ small` on `keys`, with the big side salted.
    * `joinType` is restricted to left-preserving types (see
    * [[soundJoinTypes]]): the small side is replicated `saltFactor`×, so
    * any join that preserves ITS unmatched rows would duplicate them.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    require(soundJoinTypes.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports ${soundJoinTypes.mkString("/")} — '$joinType' would " +
        "emit unmatched small-side rows once per salt; swap the sides instead")
    // per-row uniform salt; the seed only fixes the partition placement,
    // any salt value joins correctly because the small side carries all
    val salted = big.withColumn("__salt", (rand(42) * saltFactor).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}

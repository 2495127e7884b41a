package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins.
  *
  * AQE's skew-join handles most cases at runtime (enabled in
  * GraftSession); salting is the explicit fallback for pathological keys
  * or non-AQE paths: the skewed (large) side gets a random salt in
  * [0, factor), the other side is replicated `factor` ways, and the join
  * key becomes (key, salt) — one hot partition becomes `factor` even
  * ones. Cost: `factor`× replication of the small side, which is why the
  * replicated side should be the smaller input.
  */
object Skew {

  /** Equi-join `skewed ⋈ other` on skewed(key) = other(otherKey),
    * distributing hot keys across `factor` salted partitions. Result
    * equals the plain join (verified by SkewSpec).
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame,
                 key: String, otherKey: String, factor: Int): DataFrame = {
    val salted = skewed.withColumn("__salt",
      (rand(42) * factor).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(expr(s"sequence(0, ${factor - 1})")))
    salted.join(replicated,
      salted(key) === replicated(otherKey) &&
        salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** [[saltedJoin]] with the mitigation spent ONLY on detected hot keys:
    * one certified single-pass summary ([[graft.functions.heavyHitters]])
    * finds every key above n/(k+1) of the fact side, those keys get the
    * `factor`-way salt, and everything else joins unsalted — so the
    * other side replicates `factor`-way for ≤ k keys instead of for its
    * whole row count (full salting's cost, which is why it must pick a
    * small replicated side; this variant lifts that pressure).
    *
    * The RESULT is exact for ANY detected set — salting any key subset
    * preserves join semantics; the summary only steers where the
    * mitigation is spent. The detection filter is on c_hi (counter +
    * decTotal), the UPPER bound of each item's certified interval: the
    * Misra-Gries guarantee is that any item with true count > n/(k+1)
    * is present in the summary with c_hi ≥ true count, so filtering on
    * c_hi > n/(k+1) keeps every such item (filtering on c_lo — the r10
    * ADVICE finding — could drop a genuinely hot key whose counter was
    * decremented below the threshold). The price is possible extra
    * salting of borderline-warm keys, which costs a little replication
    * and never correctness. The ≤ k-row summary is a bounded artifact
    * (like the Bloom bitset): collecting it to the driver is O(k), not
    * O(data).
    */
  def adaptiveSaltedJoin(skewed: DataFrame, other: DataFrame,
                         key: String, otherKey: String, factor: Int,
                         k: Int = 64): DataFrame = {
    import graft.functions.heavyHitters
    // one detection pass: summary + total row count share the aggregate
    val hot = skewed
      .agg(heavyHitters(col(key).cast("string"), k).as("hh"),
        count(lit(1)).as("n"))
      .select(col("n"), explode(col("hh")).as("r"))
      .filter(col("r.c_hi") > col("n") / (k + 1))
      .select(col("r.item"))
      .collect().map(_.getString(0)).toSeq
    val isHot = col(key).cast("string").isInCollection(
      if (hot.isEmpty) Seq("__graft_no_hot_keys__") else hot)
    val salted = skewed.withColumn("__salt",
      when(isHot, (rand(42) * factor).cast("int")).otherwise(lit(0)))
    val isHotOther = col(otherKey).cast("string").isInCollection(
      if (hot.isEmpty) Seq("__graft_no_hot_keys__") else hot)
    val replicated = other.withColumn("__salt", explode(
      when(isHotOther, expr(s"sequence(0, ${factor - 1})"))
        .otherwise(array(lit(0)))))
    salted.join(replicated,
      salted(key) === replicated(otherKey) &&
        salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}

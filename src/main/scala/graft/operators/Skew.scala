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
}

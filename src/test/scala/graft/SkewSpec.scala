package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Salted skew-join equals the plain join on skewed data. */
class SkewSpec extends AnyFunSuite {
  import TestSpark._

  test("salted join result equals plain join under heavy key skew") {
    val s = spark
    import s.implicits._
    // 10k rows, 90% on one hot key
    val skewed = (1 to 10000)
      .map(i => (if (i % 10 == 0) i.toLong % 100 else 7L, i))
      .toDF("k", "v")
    val dim = (0L to 99L).map(k => (k, s"dim_$k")).toDF("dk", "name")

    val plain = skewed.join(dim, col("k") === col("dk"))
      .groupBy("k").agg(count("*").as("c"), sum("v").as("sv"))
    val salted = Skew.saltedJoin(skewed, dim, "k", "dk", factor = 8)
      .groupBy("k").agg(count("*").as("c"), sum("v").as("sv"))

    assert(rows(salted) == rows(plain))
    // the salted plan joins on (key, salt): exchange key must include salt
    val plan = finalPlan(Skew.saltedJoin(skewed, dim, "k", "dk", 8))
    assert(plan.contains("__salt") || plan.contains("BroadcastHashJoin"), plan)
  }
}

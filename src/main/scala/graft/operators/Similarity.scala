package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{topk, vec}

/** Similarity search over an `array<float>` embedding column.
  *
  * The dot-product inner loop is the native codegen'd `VecDot` Catalyst
  * expression (graft.functions) — no UDF boxing, stays inside
  * WholeStageCodegen.
  *
  * Scale posture: the query set is broadcast (it is small by definition);
  * the corpus is never shuffled for brute force, and the IVF/LSH variants
  * bound the candidate set per query/bucket so the join never goes
  * all-pairs at 100 TB.
  */
object Similarity {

  /** Quantized cosine (vec.cosineQ): fused single-pass codegen'd
    * expression over the raw float embeddings; scores are exact integer
    * arithmetic internally, so results and top-k rankings are
    * bit-identical across engines and partitionings.
    */
  private def cosine = vec.cosineQ _

  /** Rank the scored (q_id, vec_id, cos_sim) rows down to top-k per query
    * with the native bounded-heap aggregate (graft.functions.BoundedTopK):
    * a k-bounded heap per input partition (partial, corpus parallelism),
    * k-sized heap-union at final — the shuffle carries |queries| × k rows,
    * not the full scored set. The previous `row_number() OVER (PARTITION
    * BY q_id)` form funneled every scored row into |queries| partitions
    * and sorted them — 10 tasks each sorting 10 TB at scale.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("q_id")
      .agg(topk(col("cos_sim"), col("vec_id"), k).as("tk"))
      .select(col("q_id"), posexplode(col("tk")))
      .select(col("q_id"), (col("pos") + 1).as("rnk"),
        col("col.nn_id"), col("col.cos_sim"))

  /** Brute-force cosine top-k: corpus scan × broadcast queries.
    * The exact baseline every approximate variant is measured against.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb")))
    val scored = corpus.join(q, col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim", cosine(col("q_emb"), col("embedding")))
    rankTopK(scored, k)
  }

  /** IVF-style top-k: probe only the query's coarse partition (here the
    * `label` column stands in for the centroid assignment an upstream
    * k-means would produce). At scale this is the difference between
    * scanning 100 TB and scanning one partition per query.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"), col("label").as("q_label")))
    val scored = corpus.join(q,
      col("label") === col("q_label") && col("vec_id") =!= col("q_id"))
      .withColumn("cos_sim", cosine(col("q_emb"), col("embedding")))
    rankTopK(scored, k)
  }

  /** Sign-LSH bucketed near-dup pairs: bucket on the sign pattern of the
    * first `signBits` QUANTIZED dimensions (a fixed random-hyperplane
    * sketch — deterministic and re-derivable by the oracle; quantized so
    * the sign test agrees bit-for-bit with the quantized cosine scores),
    * then pay the exact cosine only within buckets. Bucketed equi-join —
    * shuffles on the bucket key, never all-pairs.
    */
  def signLshNearDup(corpus: DataFrame, signBits: Int = 8,
                     threshold: Double = 0.4): DataFrame = {
    val b = corpus.selectExpr("vec_id", "embedding",
      s"""concat_ws('', transform(slice(embedding, 1, $signBits),
         |  x -> CASE WHEN ROUND(CAST(x AS DOUBLE) * 1048576) >= 0
         |       THEN '1' ELSE '0' END)) AS bucket""".stripMargin)
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine(col("a.embedding"), col("b.embedding")).as("cos_sim"))
      .filter(col("cos_sim") > threshold)
  }

  /** Multi-band sign-LSH: `bands` independent sign buckets over disjoint
    * dimension slices; a pair is a candidate if ANY band matches
    * (OR-amplification — recall grows with bands while each band's
    * bucket join stays tiny). The banded-LSH shape minhash dedup uses,
    * applied to embeddings: shuffle on (band idx, band value), exact
    * cosine only on candidates, never all-pairs.
    */
  def signLshBanded(corpus: DataFrame, bands: Int = 4, bandBits: Int = 8,
                    threshold: Double = 0.4, maxBucket: Int = 500): DataFrame = {
    val raw = corpus
      .select(col("vec_id"), col("embedding"), posexplode(expr(
        s"""transform(sequence(0, ${bands - 1}), b ->
           |  concat_ws('', transform(slice(embedding, b * $bandBits + 1, $bandBits),
           |    x -> CASE WHEN ROUND(CAST(x AS DOUBLE) * 1048576) >= 0
           |         THEN '1' ELSE '0' END)))""".stripMargin)))
      .toDF("vec_id", "embedding", "bidx", "bval")
    // Hot-bucket cap, same rationale as Dedup.capBuckets: the bucket join
    // is quadratic within a bucket, and an embedding cluster (boilerplate
    // pages, near-identical templates) can concentrate one. One window
    // count on the join's own (bidx, bval) key — no extra shuffle. Note
    // sign-LSH buckets also grow linearly with corpus size at FIXED
    // bandBits (2^bandBits patterns): at much larger corpora, raise
    // bandBits (more hyperplanes) rather than the cap.
    val banded = raw
      .withColumn("__bn",
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("bidx", "bval")))
      .filter(col("__bn") <= maxBucket)
      .drop("__bn")
    banded.as("a").join(banded.as("b"),
        col("a.bidx") === col("b.bidx") && col("a.bval") === col("b.bval") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine(col("a.embedding"), col("b.embedding")).as("cos_sim"))
      .distinct()
      .filter(col("cos_sim") > threshold)
  }
}

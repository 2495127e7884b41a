package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal column handling: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The decode step is a clearly-marked deterministic STUB (this container
  * ships no image/audio codecs) — what is real and tested is the
  * Spark-side plumbing a 100 TB media pipeline needs: binary column +
  * typed metadata schema, partition-parallel decode via a typed
  * `Dataset.mapPartitions` (one decoder instantiation per partition, the
  * same shape a JNI codec or ONNX session would use), and narrow
  * pipelining (no shuffle).
  */
object Multimodal {

  /** Input: a binary payload + source metadata. */
  final case class Payload(doc_id: Long, payload: Array[Byte],
                           source: String, lang: String)

  /** Output of the (stub) decoder: deterministic pseudo-features plus a
    * frame sample (every 64th byte, ≤4 frames — the video frame-sampling
    * shape: payload → bounded per-frame features). The frame sample is
    * emitted as a comma-joined string: the correctness gate's row hasher
    * cannot canonicalize array-typed cells.
    */
  final case class Meta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                        b0: Int, checksum16: Int, frame_bytes: String)

  /** STUB decoder: stands in for image decode / resize / frame-sample.
    * Deterministic byte arithmetic so the DuckDB oracle can re-derive the
    * values; a real deployment swaps only this function body.
    */
  def fakeDecode(p: Payload): Meta = {
    val n = p.payload.length
    Meta(
      doc_id = p.doc_id,
      n_bytes = n,
      width = n % 64,
      height = (n / 64) % 64,
      b0 = if (n > 0) p.payload(0) & 0xff else -1,
      checksum16 = p.payload.take(16).map(_ & 0xff).sum,
      frame_bytes = (0 until math.min(4, (n + 63) / 64))
        .map(k => p.payload(k * 64) & 0xff).mkString(","))
  }

  /** Build binary payloads from the documents table (utf-8 bytes stand in
    * for media blobs) and run the partition-parallel decode.
    */
  def decodeDocuments(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs
      .selectExpr("doc_id", "encode(text, 'UTF-8') AS payload", "source", "lang")
      .as[Payload]
      .mapPartitions { it =>
        // Per-partition decoder setup would go here (codec/session init).
        it.map(fakeDecode)
      }
      .toDF()
  }
}

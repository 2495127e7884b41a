package graft.operators

import org.apache.spark.sql.DataFrame

/** Text-analysis operators over the `documents` table: quality stats,
  * language ID, token counting, fingerprinting. All pure narrow
  * projections built from codegen'd builtins — the ideal 100 TB shape:
  * one pass over the corpus, column-pruned to (doc_id, text). The
  * CPU-heavy ones go through Par.spread (a no-op when the scan is
  * already parallel) so per-word hashing isn't pinned to a few scan
  * tasks on low-split sources.
  */
object TextAnalysis {

  /** Stopword markers used by the quality/language heuristics. */
  val stopwords: Seq[String] = Seq("the", "a", "and", "of", "to")
  private def inList = stopwords.map(w => s"'$w'").mkString(", ")

  /** Per-document quality statistics: token counts, type/token ratio,
    * average word length, stopword ratio.
    */
  def stats(docs: DataFrame): DataFrame =
    Par.spread(docs).selectExpr("doc_id", "split(text, ' ') AS ws", "text")
      .selectExpr(
        "doc_id",
        "length(text) AS char_len",
        "size(ws) AS n_words",
        "size(array_distinct(ws)) AS n_types",
        "size(array_distinct(ws)) / size(ws) AS ttr",
        "length(replace(text, ' ', '')) / size(ws) AS avg_word_len",
        s"size(filter(ws, w -> w IN ($inList))) / size(ws) AS stopword_ratio")

  /** N-gram-heuristic language ID: score = stopword-marker hits; the
    * prediction falls back to 'und' when no markers fire. (The testdata
    * corpus is synthetic English-ish vocabulary, so the discriminating
    * power is trivial — the operator shape is what scales.)
    */
  def langId(docs: DataFrame): DataFrame =
    docs.selectExpr("doc_id", "lang", "split(text, ' ') AS ws")
      .selectExpr(
        "doc_id", "lang",
        s"size(filter(ws, w -> w IN ($inList))) AS s_en",
        s"""CASE WHEN size(filter(ws, w -> w IN ($inList))) > 0
           |THEN 'en' ELSE 'und' END AS pred_lang""".stripMargin)

  /** Token counting: whitespace tokens vs a BPE-ish regex tokenizer
    * ([a-z]+ | digit runs), plus bytes-per-token.
    */
  def tokens(docs: DataFrame): DataFrame =
    docs.selectExpr(
      "doc_id",
      "size(split(text, ' ')) AS n_ws_tokens",
      "size(regexp_extract_all(text, '[a-z]+|[0-9]+', 0)) AS n_re_tokens",
      "length(text) / size(regexp_extract_all(text, '[a-z]+|[0-9]+', 0)) AS bytes_per_token")

  /** Document fingerprints: an order-insensitive content fingerprint
    * (md5 of the sorted distinct vocabulary) and a prefix fingerprint.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    Par.spread(docs).selectExpr(
      "doc_id",
      "md5(array_join(array_sort(array_distinct(split(text, ' '))), ' ')) AS vocab_fp",
      "md5(substring(text, 1, 32)) AS prefix_fp")
}

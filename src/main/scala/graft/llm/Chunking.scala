package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — the retrieval/packing prep step of
  * an LLM data pipeline (RAG corpora, long-document splitting for
  * fixed-context training). Splits each document into windows of
  * `chunkTokens` whitespace tokens advancing by `chunkTokens -
  * overlapTokens`, so consecutive chunks share `overlapTokens` tokens of
  * context.
  *
  * Beyond-reference surface (the reference generates data; chunking is the
  * inverse prep step its corpora feed into). Tokenization matches
  * [[TextAnalysis.tokens]] (trim + split on `\s+`, case-preserving).
  *
  * Scale shape: one narrow projection + one generator (`explode` of a
  * per-row chunk-index sequence) — ZERO shuffles, no UDF, whole plan
  * whole-stage-codegen'd. A 100 TB corpus streams through map-side; output
  * partitioning inherits the input's, so a downstream per-chunk embed or
  * pack step starts from the same distribution. Every arithmetic step is
  * integer (`div`/`least`), so the layout is exactly replayable in SQL.
  *
  * Chunk layout for a document of `n` tokens (stride `S = chunkTokens -
  * overlapTokens`): chunk `i` covers tokens `[i*S, min(i*S + chunkTokens,
  * n))`; the chunk count is `1 + ceil(max(0, n - chunkTokens) / S)` —
  * every token is covered, the final chunk is the only short one, and a
  * doc that exactly tiles gets no empty tail chunk. Empty documents yield
  * zero chunks; null-text rows are dropped.
  */
object Chunking {

  /** @return one row per chunk: the id column, `chunk_id` (0-based),
    *   `n_chunks` (per-document total), `chunk_tokens` (window length,
    *   `chunkTokens` except the final partial), `chunk_text` (tokens
    *   rejoined single-space). */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens), got $overlapTokens " +
        s"(overlap == chunk size would never advance)")
    val stride = (chunkTokens - overlapTokens).toLong
    val c = lit(chunkTokens.toLong)
    val toks = TextAnalysis.tokens(col(textCol))
    val n = size(toks).cast("long")
    // Integer chunk count; when(n_chunks > 0, ...) keeps sequence() away
    // from an empty doc (sequence(0, -1) would count DOWN, not be empty).
    val nTok = col("__graft_n")
    val nChunks = when(nTok <= 0L, 0L)
      .otherwise(expr(s"(greatest(__graft_n - $chunkTokens, ${0L}L) + ${stride - 1}) " +
        s"div $stride") + 1L)
    df.where(col(textCol).isNotNull)
      .select(col(idCol), toks.as("__graft_toks"), n.as("__graft_n"))
      .withColumn("__graft_nc", nChunks)
      .withColumn("chunk_id",
        explode(when(col("__graft_nc") > 0L,
          sequence(lit(0L), col("__graft_nc") - 1L))
          .otherwise(array().cast("array<long>"))))
      .select(col(idCol), col("chunk_id"), col("__graft_nc").as("n_chunks"),
        least(c, col("__graft_n") - col("chunk_id") * stride).as("chunk_tokens"),
        array_join(slice(col("__graft_toks"),
          (col("chunk_id") * stride + 1L).cast("int"), lit(chunkTokens)), " ")
          .as("chunk_text"))
  }
}

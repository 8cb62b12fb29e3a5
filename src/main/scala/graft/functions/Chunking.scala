package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for training-data pipelines: split each document into
  * fixed-size overlapping token windows — the shape a pretraining pipeline
  * feeds to tokenization/packing. Fully relational (split → sequence →
  * explode → slice inside whole-stage codegen): no UDF, no per-row state,
  * the explode is the only row amplification and is bounded by
  * n_tokens/step per document. At 100 TB this runs as a narrow projection
  * per input partition — no shuffle at all.
  *
  * Window layout: starts at multiples of `chunkSize − overlap`; the last
  * window is the first one that reaches the document's end (no trailing
  * window fully contained in its predecessor). A document shorter than one
  * window yields exactly one chunk; whitespace-only documents yield none.
  * Chunk text is re-joined with single spaces — the same token stream, not
  * byte-identical whitespace (tokens are the unit a training pipeline
  * consumes).
  */
object Chunking {

  /** @return (idCol, chunk_index, start_token, n_tokens, chunk_text) */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize,
      "overlap must be in [0, chunkSize) or consecutive windows never advance")
    val step = chunkSize - overlap
    val start: Column = col("chunk_index") * step
    // drop empty tokens, not just leading/trailing spaces: Spark's trim()
    // strips only ' ' (a doc of tabs would otherwise chunk as ["",""])
    df.select(col(idCol),
        filter(TextAnalysis.tokens(col(textCol)), t => length(t) > 0).as("toks"))
      .where(size(col("toks")) > 0)
      .withColumn("n_tok", size(col("toks")))
      // 1 + ceil((n_tok − chunkSize) / step) windows once the doc outgrows
      // a single one; integer arithmetic so the DuckDB oracle mirrors it
      .withColumn("n_chunks",
        when(col("n_tok") <= chunkSize, lit(1))
          .otherwise(lit(1) +
            expr(s"(n_tok - $chunkSize + ${step - 1}) DIV $step").cast("int")))
      .withColumn("chunk_index", explode(sequence(lit(0), col("n_chunks") - 1)))
      .select(col(idCol),
        col("chunk_index").cast("long").as("chunk_index"),
        start.cast("long").as("start_token"),
        least(lit(chunkSize), col("n_tok") - start).cast("long").as("n_tokens"),
        concat_ws(" ", slice(col("toks"), start + 1, lit(chunkSize))).as("chunk_text"))
  }
}

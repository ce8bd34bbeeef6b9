package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{size => arraySize}

/** Stride-overlapped context chunking — the splitter every LLM data
  * pipeline runs before embedding or pretraining-window assembly: each
  * document's token stream becomes windows of `size` tokens starting
  * every `stride` tokens (stride < size ⇒ overlap; the ragged tail
  * window is kept, so every token lands in ≥1 chunk).
  *
  * 100 TB shape: chunk starts and slices are computed with array HOFs
  * inside ONE codegen projection over the token array — `sequence` for
  * the start offsets, `slice` per start, a single `posexplode` to rows.
  * Zero shuffle in the operator (callers aggregate or write as needed);
  * per-row work is doc_len / stride windows, never corpus-sized. This is
  * [[Packing.seqPack]]'s complement: seqPack concatenates ACROSS docs
  * for pretraining, chunking splits WITHIN docs for retrieval/eval.
  */
object Chunking {

  /** One row per chunk: (chunk_idx, chunk_text, n_tokens) alongside every
    * other column of `docs`. Documents with no tokens yield no rows. */
  def chunk(docs: DataFrame, textCol: Column, size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0, s"size=$size stride=$stride must be positive")
    val toks = filter(split(textCol, " "), t => length(t) > lit(0))
    docs
      .withColumn("_l", toks)
      .withColumn("_starts",
        when(arraySize(col("_l")) > 0,
          sequence(lit(0), arraySize(col("_l")) - 1, lit(stride)))
          .otherwise(array()))
      .select(col("*"),
        posexplode(transform(col("_starts"),
          s => slice(col("_l"), s + 1, lit(size)))).as(Seq("chunk_idx", "_c")))
      .select(docs.columns.map(col) :+
        col("chunk_idx") :+
        array_join(col("_c"), " ").as("chunk_text") :+
        arraySize(col("_c")).as("n_tokens"): _*)
  }
}

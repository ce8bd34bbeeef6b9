package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tokenizer-training support: corpus statistics for BPE merge selection.
  *
  * The classic BPE training loop (Sennrich et al. 2016) never iterates
  * over the corpus — it counts words ONCE, then every merge round runs
  * over the (tiny) weighted vocabulary. This module is that decomposition
  * in Spark: [[wordFreqs]] is the single corpus-sized aggregate;
  * [[topPairs]] ranks adjacent-symbol pairs over the vocabulary.
  *
  * 100 TB shape: one word-keyed shuffle with map-side partial counts
  * (identical structure to the TF-IDF tf pass); everything after operates
  * on DISTINCT words — vocabulary-sized, millions of rows at any corpus
  * size — and the pair table is bounded by charset² regardless of input.
  * The final ranking window is a single-partition sort of that bounded
  * pair table (thousands of rows), deliberately NOT a corpus sort.
  */
object BpeStats {

  /** (word, f) — the only corpus-sized pass (map-side partial counts
    * bound the exchange at partition-distinct words). */
  def wordFreqs(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(split(textCol, " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("f"))

  /** Top-k adjacent character pairs by frequency-weighted count — the
    * argmax set of BPE's first merge round. Returns (rank, pair, n),
    * ties broken lexicographically. */
  def topPairs(docs: DataFrame, textCol: Column, k: Int): DataFrame = {
    val vocab = wordFreqs(docs, textCol).filter(length(col("word")) >= 2)
    val pairCounts = vocab
      .select(col("f"), explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum("f").as("n"))
    pairCounts
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("pair"))))
      .filter(col("rank") <= k)
      .select(col("rank"), col("pair"), col("n"))
  }
}

package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class RelevanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "the cat sat on the mat", "en"),
    (1L, "the dog sat on the log", "en"),
    (2L, "le chat noir", "fr"),
    (3L, "cat cat cat dog", "en")
  ).toDF("doc_id", "text", "lang")

  test("tfIdfTopK scores against a hand model") {
    val got = Relevance.tfIdfTopK(docs, "doc_id", col("text"), 2)
      .as[(Long, Int, String, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // hand model: n=4 docs; df: the=2, cat=2, sat=2, on=2, mat=1, dog=2,
    // log=1, le=1, chat=1, noir=1
    def s(tf: Int, df: Int): Double =
      BigDecimal(tf * math.log(4.0 / df))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 0: "the"(tf2,df2)=2ln2≈1.386294 beats "mat"(1,1)=ln4≈1.386294...
    // 2*ln(2) == ln(4) exactly in the reals but NOT in doubles:
    // 2*Math.log(2.0)=1.3862943611198906, Math.log(4.0)=1.3862943611198906
    // (they happen to be equal bit patterns) -> tie broken by term: "mat"
    assert(got((0L, 1)) === ("mat", s(1, 1)))
    assert(got((0L, 2)) === ("the", s(2, 2)))
    // doc 3: cat tf=3 df=2 -> 3ln2 ≈ 2.079 beats dog ln2 ≈ 0.693
    assert(got((3L, 1)) === ("cat", s(3, 2)))
    assert(got((3L, 2)) === ("dog", s(1, 2)))
    // doc 2's unique terms all score ln4, ties broken lexicographically
    assert(got((2L, 1))._1 === "chat")
    assert(got((2L, 2))._1 === "le")
  }

  test("tfIdfTopK is partitioning-invariant") {
    val a = Relevance.tfIdfTopK(docs.repartition(1), "doc_id", col("text"), 3)
      .as[(Long, Int, String, Double)].collect().sortBy(r => (r._1, r._2))
    val b = Relevance.tfIdfTopK(docs.repartition(7), "doc_id", col("text"), 3)
      .as[(Long, Int, String, Double)].collect().sortBy(r => (r._1, r._2))
    graft.CacheBin.drain()
    assert(a.toSeq === b.toSeq)
  }

  test("importanceWeights: target-like docs score higher than off-target") {
    val w = Relevance.importanceWeights(
      docs, "doc_id", col("text"), col("lang") === "en", buckets = 16)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    graft.CacheBin.drain()
    // the French doc's tokens live in buckets the EN target never hit:
    // every one carries ln(1/(tt+16)) − ln(2/(tr+16)) with tr > tt, still
    // the smallest ratios in the corpus — it must rank strictly last
    assert(w(2L) === w.values.min)
    // weights are per-token sums: docs 0/1 share 4 of 6 tokens, close
    assert(math.abs(w(0L) - w(1L)) < math.abs(w(0L) - w(2L)))
  }

  test("importanceWeights on an empty corpus returns empty, not NPE") {
    val empty = docs.filter(col("doc_id") < 0)
    val out = Relevance.importanceWeights(
      empty, "doc_id", col("text"), col("lang") === "en", buckets = 8)
    assert(out.count() === 0)
    graft.CacheBin.drain()
  }

  test("importanceWeights matches a hand computation on one bucket layout") {
    // single doc per class, 1 bucket: every token maps to bucket 0, so the
    // weight collapses to n_tokens * (ln((tt+1)/(tt+1)) - ln((tr+1)/(tr+1)))
    // = 0 exactly — the smoothed distributions coincide
    val w = Relevance.importanceWeights(
      docs, "doc_id", col("text"), col("lang") === "en", buckets = 1)
      .as[(Long, Long, Double)].collect()
    graft.CacheBin.drain()
    val tt = 6 + 6 + 4 // en tokens
    val tr = tt + 3
    val perTok = math.log((tt + 1).toDouble / (tt + 1)) -
      math.log((tr + 1).toDouble / (tr + 1))
    assert(perTok === 0.0)
    w.foreach { case (_, nTok, wt) =>
      val exp = BigDecimal(nTok * (math.log((tt + 1).toDouble / (tt + 1)) -
        math.log((tr + 1).toDouble / (tr + 1))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(wt === exp)
    }
  }

  test("bm25TopK matches a hand model; rank by rounded score, doc_id tiebreak") {
    val queries = Seq((100L, "cat mat"), (200L, "dog zzz"))
      .toDF("qid", "qtext")
    val got = Relevance.bm25TopK(
        docs, "doc_id", col("text"), queries, "qid", col("qtext"), k = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._3) -> (r._2, r._4)).toMap
    graft.CacheBin.drain()
    // hand model: doc lengths 6/6/3/4, N=4, avg=19/4; df(cat)=2, df(mat)=1,
    // df(dog)=2, zzz unseen (contributes nothing)
    val avg = 19.0 / 4
    def idf(df: Int) = math.log(1.0 + (4.0 - df + 0.5) / (df + 0.5))
    def tfn(tf: Long, len: Long) =
      tf * (1.2 + 1.0) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len / avg))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s0 = r6(idf(2) * tfn(1, 6) + idf(1) * tfn(1, 6)) // doc0: cat + mat
    val s3 = r6(idf(2) * tfn(3, 4))                      // doc3: cat tf=3
    assert(got((100L, 0L)) === ((1L, s0)))               // two terms win
    assert(got((100L, 3L)) === ((2L, s3)))
    val d1 = r6(idf(2) * tfn(1, 6)) // doc1: dog, longer doc
    val d3 = r6(idf(2) * tfn(1, 4)) // doc3: dog, shorter doc scores higher
    assert(d3 > d1)
    assert(got((200L, 3L)) === ((1L, d3)))
    assert(got((200L, 1L)) === ((2L, d1)))
    assert(got.size === 4) // zzz matches nothing; no other doc holds terms
  }

  test("bm25TopK is partitioning-invariant") {
    val queries = Seq((1L, "the cat")).toDF("qid", "qtext")
    def run(parts: Int) = Relevance.bm25TopK(
        docs.repartition(parts), "doc_id", col("text"),
        queries, "qid", col("qtext"), k = 4)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val a = run(1); graft.CacheBin.drain()
    val b = run(7); graft.CacheBin.drain()
    assert(a.toSeq === b.toSeq)
  }
}

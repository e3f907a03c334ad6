package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Corpus lexical statistics: Zipf rank-frequency fit and per-document
  * lexical diversity — hand-checkable fixtures. */
class LexicalOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("zipfFit: an exact power law recovers its slope") {
    // frequencies 1000, 500, 333, 250 ... ~ rank^-1 won't be exact in
    // integers; use exact powers instead: freq = 2^(10-rank) with 4
    // types -> ln f = ln 2·(10−rank): slope = −ln 2 on the log-log line
    // only if ln rank were linear — instead fit a 2-point exact case:
    // two types, ranks 1,2, freqs 4,1: slope = (ln1−ln4)... compute
    // directly below from the closed form.
    val words =
      Seq.fill(4)("aa") ++ Seq.fill(1)("bb")
    val df = words.grouped(1).map(_.mkString(" ")).toSeq.toDF("text")
    val out = CorpusOps.zipfFit(df, col("text"), minCount = 1).collect()(0)
    assert(out.getLong(0) === 2L, "two types")
    assert(out.getLong(1) === 5L, "five tokens")
    // ranks (1,2) freqs (4,1): slope = (ln1−ln4)/(ln2−ln1) = −2
    assert(out.getLong(2) === -2000000L)
    // intercept = mean(ly) − slope·mean(lx) = (ln4/2) − (−2)(ln2/2) = 2·ln2
    assert(math.abs(out.getLong(3) - 1386294L) <= 1L)
  }

  test("zipfFit: minCount filters the tail before the fit") {
    val df = Seq("aa aa aa bb bb cc").toDF("text")
    val out = CorpusOps.zipfFit(df, col("text"), minCount = 2).collect()(0)
    assert(out.getLong(0) === 2L, "cc (count 1) is below the floor")
    assert(out.getLong(1) === 5L, "token mass counts only kept types")
  }

  test("lexicalStats: tokens, types, hapax, and ratios") {
    val df = Seq((1L, "a b a c"), (2L, "x x x x")).toDF("id", "text")
    val out = CorpusOps.lexicalStats(df, col("id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // doc 1: 4 tokens, 3 types (a,b,c), 2 hapax (b,c)
    assert(out(1L) === ((4L, 3L, 2L, 750000L, 666667L)))
    // doc 2: 4 tokens, 1 type, 0 hapax
    assert(out(2L) === ((4L, 1L, 0L, 250000L, 0L)))
  }

  test("lexicalStats: empty documents emit no row") {
    val df = Seq((1L, "a"), (2L, "   ")).toDF("id", "text")
    val ids = CorpusOps.lexicalStats(df, col("id"), col("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L))
  }

  test("randomProjection: shape, determinism, and sign structure") {
    val df = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val out = SimilarityOps.randomProjection(df, col("vec_id"),
      col("embedding"), inDim = 2, outDim = 4, seed = "s")
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(rows.size === 8, "2 vectors x 4 dims")
    // unit basis vectors: |proj| = 0.5 (1/sqrt(4)) resp. 1.0 per dim
    assert((0 to 3).forall(j => math.abs(rows((1L, j))) === 500000L))
    assert((0 to 3).forall(j => math.abs(rows((2L, j))) === 1000000L))
    val again = SimilarityOps.randomProjection(df, col("vec_id"),
      col("embedding"), inDim = 2, outDim = 4, seed = "s")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(again === rows, "projection is a pure function of the seed")
    // a different seed flips at least one sign for these 8 cells
    val other = SimilarityOps.randomProjection(df, col("vec_id"),
      col("embedding"), inDim = 2, outDim = 4, seed = "t")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(other !== rows)
  }
}

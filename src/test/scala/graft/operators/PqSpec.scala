package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Product-quantization contract: codebook shape, encode determinism, and
  * the key semantic guarantee — a vector whose subvectors ARE codewords
  * reconstructs exactly, so its self-distance is zero and searches rank it
  * first. */
class PqSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 8-dim vectors, m=2 subspaces of 4 dims, k=2 codewords per subspace
  private val base = Seq(
    (0L, Array(1f, 0f, 0f, 0f, 0f, 1f, 0f, 0f)),
    (1L, Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 1f)),
    (2L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 1f)), // cw0 of s0 + cw1 of s1
    (3L, Array(0.9f, 0.1f, 0f, 0f, 0f, 0f, 0.1f, 0.9f)), // near vec 2
    (4L, Array(0f, 0f, 0.9f, 0.1f, 0.1f, 0.9f, 0f, 0f))
  ).toDF("vec_id", "embedding")

  // an exactly-k training frame is draw-order-invariant: the codebook is
  // those k rows, indexed in id order, regardless of the sampling hash
  private val train01 = base.filter(col("vec_id") < 2)

  test("codebook splits the k training vectors into m subspaces, id-indexed") {
    val cb = SimilarityOps.pqCodebook(train01, m = 2, k = 2)
    assert(cb.length == 2 && cb.forall(_.length == 2))
    assert(cb(0)(0).toSeq == Seq(1.0, 0.0, 0.0, 0.0)) // vec 0, first half
    assert(cb(1)(1).toSeq == Seq(0.0, 0.0, 0.0, 1.0)) // vec 1, second half
  }

  test("oversized training draws by portable-hash order, indexes by id") {
    // md5("4") < md5("1") < md5("2") < md5("0") < md5("3"), so k=2 over
    // the full frame samples {1, 4} — NOT the two lowest ids — and the
    // codeword index order is id order (1 before 4) for the encode-side
    // position tiebreak
    val cb = SimilarityOps.pqCodebook(base, m = 2, k = 2)
    assert(cb(0)(0).toSeq == Seq(0.0, 0.0, 1.0, 0.0)) // vec 1, first half
    assert(cb(1)(0).toSeq == Seq(0.0, 0.0, 0.0, 1.0)) // vec 1, second half
    assert(cb(0)(1).toSeq ==
      Array(0f, 0f, 0.9f, 0.1f).map(_.toDouble).toSeq) // vec 4, first half
  }

  test("encode maps each subvector to its nearest codeword, 1-based") {
    val cb = SimilarityOps.pqCodebook(train01, m = 2, k = 2)
    val codes = SimilarityOps.pqEncode(base, cb)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes(0L) == Seq(1, 1) && codes(1L) == Seq(2, 2))
    assert(codes(2L) == Seq(1, 2)) // mixes the two training vectors' halves
    assert(codes(3L) == Seq(1, 2)) // perturbation doesn't flip the argmin
    assert(codes(4L) == Seq(2, 1))
  }

  test("a codeword-exact vector reconstructs at distance zero and ranks first") {
    val out = SimilarityOps.pqTopK(
        base, base.filter(col("vec_id") === 2), k = 3,
        SimilarityOps.pqCodebook(train01, m = 2, k = 2))
      .select("nbr_id", "dist", "rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3)
    // vecs 2 and 3 share codes (1,2): both reconstruct to vec 2's exact
    // vector, so both sit at distance 0 from query 2 and the id tiebreak
    // puts 3 first (2 itself is excluded as the query)
    assert(out.head == ((3L, 0.0, 1)))
    // 0 and 1 both reconstruct at squared-L2 2.0 from the query; the id
    // tiebreak orders them deterministically
    assert(out.map(r => (r._1, r._2)).toSeq == Seq((3L, 0.0), (0L, 2.0), (1L, 2.0)))
  }
}

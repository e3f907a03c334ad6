package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Partial-merge algebra of the ValueHistogram aggregator — the property the
  * reference's AggregatorTests hand-rolls (combiner output == direct
  * reduce): merge must be commutative/associative and consistent with
  * element-wise reduce, because Spark applies it in arbitrary partial order. */
class ValueHistogramSpec extends AnyFunSuite {
  private val agg = new ValueHistogram

  private def fold(xs: Seq[String]): Map[String, Long] =
    xs.foldLeft(agg.zero)(agg.reduce)

  private val values = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e"))

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: $res")
  }

  test("merge(fold(xs), fold(ys)) == fold(xs ++ ys)") {
    check("merge-consistent", Prop.forAll(values, values) { (xs, ys) =>
      agg.merge(fold(xs), fold(ys)) == fold(xs ++ ys)
    })
  }

  test("merge is commutative") {
    check("merge-commutative", Prop.forAll(values, values) { (xs, ys) =>
      agg.merge(fold(xs), fold(ys)) == agg.merge(fold(ys), fold(xs))
    })
  }

  test("finish computes the reference's summary stats") {
    // freqs: a->3, b->1 => n=2, min=1, max=3, mean=2, median=2, stddev=1
    val s = agg.finish(fold(Seq("a", "a", "a", "b")))
    assert(s == HistogramSummary(2L, 1L, 2.0, 3L, 2.0, 1.0))
  }

  test("finish on empty buffer") {
    assert(agg.finish(agg.zero) == HistogramSummary(0L, 0L, 0.0, 0L, 0.0, 0.0))
  }
}

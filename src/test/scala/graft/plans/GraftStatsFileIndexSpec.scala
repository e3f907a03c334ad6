package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, Cast, EqualTo, Literal}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
import org.scalatest.funsuite.AnyFunSuite

/** The cast guard of the scan-planning stats index (ADVICE r13): a
  * bound may transfer through a cast ONLY when the cast is a loss-free
  * widening. A narrowing/truncating cast (`cast(v AS INT) = 7` over a
  * file with v ∈ [7.5, 7.9] — every row matches after truncation)
  * would otherwise yield bounds [7,7], report disjointness, and SKIP a
  * file whose rows match: silent wrong results. Spark strips the safe
  * widening casts before pushdown (UnwrapCastInBinaryComparison), so
  * the casts that actually reach a FileIndex are disproportionately
  * the unsafe ones. */
class GraftStatsFileIndexSpec extends AnyFunSuite {

  test("widening casts transfer the bound; narrowing casts never prune") {
    val intCol = AttributeReference("v", IntegerType)()
    val dblCol = AttributeReference("d", DoubleType)()
    val lngCol = AttributeReference("l", LongType)()

    // int → double is loss-free widening: the bound transfers
    assert(GraftStatsFileIndex.boundsOf(
      EqualTo(Cast(intCol, DoubleType), Literal(7.0d))) ===
      Seq(("v", 7.0, 7.0)))
    // int → long likewise
    assert(GraftStatsFileIndex.boundsOf(
      EqualTo(Cast(intCol, LongType), Literal(7L))) ===
      Seq(("v", 7.0, 7.0)))

    // double → int TRUNCATES: rows in [7.0, 8.0) all satisfy
    // cast(d AS INT) = 7, so no bound may derive — file must read
    assert(GraftStatsFileIndex.boundsOf(
      EqualTo(Cast(dblCol, IntegerType), Literal(7))) === Nil)
    // long → int can OVERFLOW: same rule
    assert(GraftStatsFileIndex.boundsOf(
      EqualTo(Cast(lngCol, IntegerType), Literal(7))) === Nil)

    // bare attributes still bound as before
    assert(GraftStatsFileIndex.boundsOf(
      EqualTo(intCol, Literal(7))) === Seq(("v", 7.0, 7.0)))
  }
}

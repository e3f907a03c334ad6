package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Prefix-split exhaustive search (the DistributedPentomino/DistBbp
  * shape): the distributed subtree counts must reassemble the known
  * n-queens totals exactly. */
class SearchOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("nQueensByFirstColumn reassembles exact totals for n=8 and n=6") {
    val n8 = SearchOps.nQueensByFirstColumn(spark, 8)
      .as[(Long, Long)].collect().toMap
    assert(n8.values.sum == 92L)
    assert(n8.keySet == (0L to 7L).toSet)
    // column symmetry: mirrored first columns count identically
    (0 to 3).foreach(c => assert(n8(c.toLong) == n8(7L - c)))
    val n6 = SearchOps.nQueensByFirstColumn(spark, 6)
      .as[(Long, Long)].collect().toMap
    assert(n6.values.sum == 4L)
  }
}

package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.TestSpark

class KeyFieldSpecSpec extends AnyFunSuite {
  import KeyFieldSpec._

  test("parses -k specs with numeric/reverse flags") {
    assert(parse("-k2,2nr") == Seq(KeyPart(2, 2, numeric = true, reverse = true)))
    assert(parse("-k1,3") == Seq(KeyPart(1, 3, numeric = false, reverse = false)))
    assert(parse("-k4n") == Seq(KeyPart(4, 4, numeric = true, reverse = false)))
    assert(parse("-k1,1 -k2,2nr") ==
      Seq(KeyPart(1, 1, false, false), KeyPart(2, 2, true, true)))
  }

  test("numeric-desc sort beats lexicographic") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(("a", "9"), ("a", "10"), ("b", "2")).toDF("f1", "f2")
    val sorted = df
      .orderBy(orderColumnsNamed(Seq(col("f1"), col("f2")), "-k1,1 -k2,2nr"): _*)
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
    // numeric: 10 before 9 (lexicographic would say "9" > "10")
    assert(sorted.toSeq == Seq(("a", "10"), ("a", "9"), ("b", "2")))
  }
}

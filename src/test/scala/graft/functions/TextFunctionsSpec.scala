package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TextFunctionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("tokens drops empty strings from multi-space text") {
    val got = Seq("  a  b   c ").toDF("t")
      .select(TextFunctions.tokens(col("t"))).as[Seq[String]].head()
    assert(got == Seq("a", "b", "c"))
  }

  test("wordShingles produces distinct k-grams; short docs yield empty") {
    val got = Seq("a b c d").toDF("t")
      .select(TextFunctions.wordShingles(col("t"), 3)).as[Seq[String]].head()
    assert(got == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(TextFunctions.wordShingles(col("t"), 3)).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("fingerprint matches a hand-rolled rolling hash") {
    def roll(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    val texts = Seq("hello", "spark engine", "")
    val got = texts.toDF("t")
      .select(TextFunctions.fingerprint(col("t"))).as[Long].collect().toSeq
    assert(got == texts.map(roll))
  }

  test("stopword ratio and quality score bounds") {
    val df = Seq("the cat sat on the mat", "!!! ??? ***").toDF("t")
    val rows = df.select(
      TextFunctions.stopwordRatio(col("t")).as("sr"),
      TextFunctions.punctRatio(col("t")).as("pr"),
      TextFunctions.qualityScore(col("t")).as("q")).collect()
    assert(rows(0).getDouble(0) > 0.0)
    assert(rows(1).getDouble(1) == 1.0)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("portableHash is a fixed-width md5-derived hex string") {
    val got = Seq("x").toDF("t")
      .select(TextFunctions.portableHash(col("t"), 3)).as[String].head()
    // md5("3:x") prefix — fixed width so lexicographic min == numeric min
    assert(got.length == 16 && got.matches("[0-9a-f]{16}"))
  }
}

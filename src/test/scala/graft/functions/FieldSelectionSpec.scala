package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.TestSpark

class FieldSelectionSpec extends AnyFunSuite {
  import FieldSelection._

  test("parses the reference spec grammar") {
    val s = parse("4,3,0,1-2:6,5,1-3,7-")
    assert(s.keyFields == Seq(Single(4), Single(3), Single(0), Range(1, 2)))
    assert(s.valueFields == Seq(Single(6), Single(5), Range(1, 3), OpenRange(7)))
  }

  test("empty value side") {
    val s = parse("0,2")
    assert(s.keyFields == Seq(Single(0), Single(2)))
    assert(s.valueFields.isEmpty)
  }

  test("selects and re-joins fields like the reference mapper") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq("a-b-c-d-e-f").toDF("line")
    val (k, v) = select(col("line"), "2,0:1,3-", "-")
    val row = df.select(k.as("k"), v.as("v")).head()
    assert(row.getString(0) == "c-a")
    assert(row.getString(1) == "b-d-e-f")
  }

  test("open range beyond length yields empty selection") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq("x-y").toDF("line")
    val (k, _) = select(col("line"), "5-:0", "-")
    assert(df.select(k).head().getString(0) == "")
  }
}

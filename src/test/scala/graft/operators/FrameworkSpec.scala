package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.core.CounterOps
import graft.sources.TextGen

class FrameworkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("aggregator framework computes all descriptor families in one pass") {
    import AggregatorFramework._
    val df = Seq(("a", 1L, 2.5), ("a", 5L, 1.5), ("b", 3L, 4.0))
      .toDF("grp", "lv", "dv")
    val out = AggregatorFramework.run(df, Seq(
      Descriptor(LongValueSum, col("grp"), col("lv")),
      Descriptor(DoubleValueSum, col("grp"), col("dv")),
      Descriptor(LongValueMax, col("grp"), col("lv")),
      Descriptor(LongValueMin, col("grp"), col("lv")),
      Descriptor(StringValueMax, lit("g"), col("grp")),
      Descriptor(UniqValueCount, col("grp"), col("lv"))))
      .as[(String, String)].collect().toMap
    assert(out("LongValueSum:a") == "6")
    assert(out("DoubleValueSum:a") == "4.000000")
    assert(out("LongValueMax:a") == "5")
    assert(out("LongValueMin:a") == "1")
    assert(out("StringValueMax:g") == "b")
    assert(out("UniqValueCount:a") == "2")
  }

  test("uniq count respects the cap (UniqValueCount.maxNumItems parity)") {
    import AggregatorFramework._
    val df = (1 to 50).map(i => ("k", i)).toDF("grp", "v")
    val out = AggregatorFramework.run(df, Seq(Descriptor(UniqValueCount, col("grp"), col("v"))),
      uniqCap = 10).as[(String, String)].collect().toMap
    assert(out("UniqValueCount:k") == "10")
  }

  test("join expression language parses and compiles the reference grammar") {
    val a = Seq((1, 10), (2, 20)).toDF("key", "value")
    val b = Seq((2, 200), (3, 300)).toDF("key", "value")
    val tables: String => org.apache.spark.sql.DataFrame =
      Map("a" -> a, "b" -> b)
    val inner = JoinExpr.compile("""inner(tbl("a"),tbl("b"))""", tables)
    assert(inner.select("key").as[Int].collect().toSeq == Seq(2))
    val outer = JoinExpr.compile("""outer(tbl("a"),tbl("b"))""", tables)
    assert(outer.count() == 3)
    val over = JoinExpr.compile("""override(tbl("a"),tbl("b"))""", tables)
    assert(over.as[(Int, Int)].collect().toMap == Map(1 -> 10, 2 -> 200, 3 -> 300))
  }

  test("join expression composes NESTED ops like the reference's tree of readers") {
    // inner(a, outer(b, c)): the outer leg keeps keys 2,3,4; inner with a
    // then keeps 2 (from both) — matches CompositeInputFormat's composed
    // reader semantics (reference grammar doc CompositeInputFormat.java:70-80)
    val a = Seq((1, 10), (2, 20)).toDF("key", "value")
    val b = Seq((2, 200), (3, 300)).toDF("key", "value")
    val c = Seq((3, 3000), (4, 4000)).toDF("key", "value")
    val tables: String => org.apache.spark.sql.DataFrame =
      Map("a" -> a, "b" -> b, "c" -> c)
    val nested = JoinExpr.compile("""inner(tbl("a"),outer(tbl("b"),tbl("c")))""", tables)
    val rows = nested.collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(2))
    // three-deep: override over an inner leg's key set
    val deep = JoinExpr.compile(
      """outer(tbl("a"),inner(tbl("b"),tbl("c")))""", tables)
    assert(deep.select("key").as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("join expression rejects malformed input") {
    intercept[IllegalArgumentException](JoinExpr.parse("inner(tbl(\"a\"))"))
    intercept[IllegalArgumentException](JoinExpr.parse("bogus(tbl(\"a\"),tbl(\"b\"))"))
    intercept[IllegalArgumentException](JoinExpr.parse("inner(tbl(\"a\"),tbl(\"b\")))"))
  }

  test("observe counters aggregate during the query (Counters parity)") {
    val df = (1 to 100).toDF("v")
    val (counted, obs) = CounterOps.withCounters(df, "job",
      Map("n" -> count(lit(1)), "big" -> sum(when(col("v") > 50, 1).otherwise(0))))
    counted.write.mode("overwrite").format("noop").save()
    assert(obs.get("n") == 100L)
    assert(obs.get("big") == 50L)
  }

  test("text generator is deterministic and split-parallel") {
    val c1 = TextGen.corpus(spark, 100, 10, parts = 4)
    val c2 = TextGen.corpus(spark, 100, 10, parts = 8)
    assert(c1.count() == 100)
    assert(c1.except(c2).isEmpty) // same content regardless of partitioning
    val words = c1.select(explode(split(col("text"), " "))).distinct().count()
    assert(words > 5) // uses a spread of the vocab
  }
}

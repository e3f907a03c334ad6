package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import org.apache.spark.sql.Row
import graft.TestSpark

class SortGroupOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("globalRowNumber equals a single-partition window row_number") {
    val df = (1 to 500).map(i => (i * 7919 % 101, i)).toDF("k", "id")
      .repartition(4)
    val got = SortOps.globalRowNumber(df, Seq(col("k").asc, col("id").asc))
      .select("k", "id", "rn")
    val want = df.withColumn("rn",
      row_number().over(Window.orderBy(col("k").asc, col("id").asc)).cast("long"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("groupedRunningMin equals the per-group window prefix min") {
    // 2 fat groups spanning many range partitions (the boundary-seed
    // path), values dip NEGATIVE mid-group so a wrong seed shows up
    val df = (1L to 5000L)
      .map(i => (i % 2, i, ((i * 48271L) % 1001) - 500L))
      .toDF("g", "id", "v").repartition(7)
    val got = SortOps.groupedRunningMin(df, Seq("g"),
        Seq(col("g"), col("id")), col("v"), "rm")
      .select("g", "id", "rm")
    val want = df.withColumn("rm", min(col("v")).over(
      Window.partitionBy("g").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, 0)))
      .select("g", "id", "rm")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // many tiny groups: no group crosses a boundary chain of interest
    val tiny = (1L to 2000L).map(i => (i % 400, i, 1000L - i))
      .toDF("g", "id", "v").repartition(5)
    val got2 = SortOps.groupedRunningMin(tiny, Seq("g"),
        Seq(col("g"), col("id")), col("v"), "rm")
      .select("g", "id", "rm")
    val want2 = tiny.withColumn("rm", min(col("v")).over(
      Window.partitionBy("g").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, 0)))
      .select("g", "id", "rm")
    assert(got2.except(want2).isEmpty && want2.except(got2).isEmpty)
  }

  test("topK returns exactly the k smallest by order") {
    val df = (1 to 100).map(i => (i * 37 % 97, i)).toDF("v", "id")
    val got = SortOps.topK(df, Seq(col("v").desc, col("id")), 5)
      .select("v", "id").as[(Int, Int)].collect().toSeq
    val want = df.as[(Int, Int)].collect().toSeq
      .sortBy { case (v, id) => (-v, id) }.take(5)
    assert(got == want)
  }

  test("modSample keeps exactly keys divisible by f") {
    val df = (0 until 100).toDF("k")
    assert(SortOps.modSample(df, col("k"), 10).as[Int].collect().toSeq.sorted ==
      (0 until 100 by 10))
  }

  test("sortedGroups sees each group's rows ordered by the sort key") {
    val rows = Seq((1, 3), (1, 1), (2, 9), (1, 2), (2, 5))
    val df = rows.toDF("k", "v").repartition(3)
    val schema = StructType(Seq(
      StructField("k", IntegerType), StructField("cnt", IntegerType),
      StructField("firstv", IntegerType), StructField("sortedOk", IntegerType)))
    val out = GroupOps.sortedGroups(df, Seq(col("k")), Seq(col("v")))(
      (head, group) => {
        val vs = group.map(_.getInt(1))
        Iterator(Row(head.getInt(0), vs.size, vs.head,
          if (vs == vs.sorted) 1 else 0))
      }, schema)
    val got = out.as[(Int, Int, Int, Int)].collect().toSet
    assert(got == Set((1, 3, 1, 1), (2, 2, 5, 1)))
  }

  test("hashSplit is a stable pure function of the key with exact cuts") {
    val df = (1L to 2000L).toDF("id")
    val out = SortOps.hashSplit(df, col("id"))
    // deterministic: same assignment on re-evaluation and under re-partitioning
    val a = out.select("id", "split").as[(Long, String)].collect().toMap
    val b = SortOps.hashSplit(df.repartition(7), col("id"))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
    // roughly 80/10/10 (md5 is uniform; wide tolerance avoids flakiness)
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9)
    assert(frac("val") > 0.05 && frac("test") > 0.05)
    intercept[IllegalArgumentException](
      SortOps.hashSplit(df, col("id"), Seq("a" -> 50, "b" -> 90)))
  }

  test("weightedPrioritySample: deterministic, k-sized, weight-biased") {
    val df = (1L to 1000L).map(i => (i, if (i <= 100) 1000L else 1L))
      .toDF("id", "w")
    val pick = SortOps.weightedPrioritySample(df, col("id"), col("w"), k = 50)
      .as[(Long, Long)].collect().toSeq
    assert(pick.size == 50)
    // two runs agree exactly (pure function of the keys)
    val again = SortOps.weightedPrioritySample(df, col("id"), col("w"), k = 50)
      .as[(Long, Long)].collect().toSeq
    assert(pick.sortBy(_._1) == again.sortBy(_._1))
    // 100 rows carry 1000x the weight of the other 900: they should
    // dominate the sample (expected ~49 of 50)
    assert(pick.count(_._2 == 1000L) > 40)
    // non-positive and null weights never selected
    val withBad = df.union(Seq((2000L, 0L), (2001L, -5L)).toDF("id", "w"))
    val picked = SortOps.weightedPrioritySample(withBad, col("id"), col("w"), 2000)
      .as[(Long, Long)].collect().map(_._1).toSet
    assert(!picked.contains(2000L) && !picked.contains(2001L) && picked.size == 1000)
  }

  test("sessionize splits on gaps larger than the threshold") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(minutes: Int) = new java.sql.Timestamp(base.getTime + minutes * 60000L)
    val df = Seq(
      (1L, at(0), 1L), (1L, at(10), 2L), (1L, at(100), 3L), // user 1: 2 sessions
      (2L, at(0), 4L)                                       // user 2: 1 session
    ).toDF("user_id", "ts", "event_id")
    val out = GroupOps.sessionize(df, col("user_id"), col("ts"), col("event_id"),
        gapMicros = 30L * 60 * 1000000)
      .groupBy("user_id").agg(max("session_id").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 1L))
  }
}

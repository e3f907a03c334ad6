package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.TopKPerKey
import graft.TestSpark

/** Custom physical operator: two-phase bounded-heap top-k per key
  * (LogicalPlan + SparkStrategy + two SparkPlans). */
class TopKPerKeySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("keeps exactly the k smallest rows per key") {
    val df = Seq(("a", 5), ("a", 1), ("a", 3), ("a", 2), ("b", 9), ("b", 7))
      .toDF("k", "v")
    val out = TopKPerKey(df, Seq(col("k")), struct(col("v")), 2)
      .as[(String, Int)].collect().toSet
    assert(out === Set(("a", 1), ("a", 2), ("b", 7), ("b", 9)))
  }

  test("k beyond the group size returns the whole group") {
    val df = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    assert(TopKPerKey(df, Seq(col("k")), struct(col("v")), 10).count() === 2)
  }

  test("exact across many partitions: partial heaps cannot lose a winner") {
    // values scattered over 8 partitions; per-key winners straddle them
    val df = spark.range(0, 10000, 1, 8)
      .select((col("id") % 7).as("k"),
        ((col("id") * 2654435761L) % 10007).as("v"))
    val got = TopKPerKey(df, Seq(col("k")), struct(col("v"), col("k")), 3)
      .select("k", "v").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted.toSeq }
    val exp = df.select("k", "v").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, vs) =>
        k -> vs.map(_._2).sorted.take(3).toSeq }
    assert(got === exp)
  }

  test("plans as Partial -> Exchange -> Final, not a window sort") {
    val df = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    val out = TopKPerKey(df, Seq(col("k")), struct(col("v")), 1)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), plan)
    assert(plan.contains("TopKPerKeyFinal"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Window"), "must not fall back to a window")
  }

  test("empty keys = ONE global top-k, not one per partition") {
    // pre-fix, UnspecifiedDistribution left the final per-partition and
    // returned up to partitions*k rows
    val df = spark.range(0, 1000, 1, 8)
      .select(((col("id") * 2654435761L) % 997).as("v"))
    val out = TopKPerKey(df, Nil, struct(col("v")), 3)
      .as[Long].collect().sorted.toSeq
    val exp = df.as[Long].collect().sorted.take(3).toSeq
    assert(out === exp)
  }

  test("helper-name collision in the input cannot hijack key resolution") {
    // an input column literally named __tpk_k0 must not be mistaken for
    // the appended key helper (attrs resolve by position now)
    val df = Seq(("a", 1, 99), ("a", 2, 0), ("b", 3, 50))
      .toDF("k", "v", "__tpk_k0")
    val out = TopKPerKey(df, Seq(col("k")), struct(col("v")), 1)
      .select("k", "v").as[(String, Int)].collect().toSet
    assert(out === Set(("a", 1), ("b", 3)),
      "top-k must key on k, not the decoy __tpk_k0")
  }

  test("high-cardinality keys: the partial flushes at the cap and stays exact") {
    val prev = spark.conf.getOption(
      org.apache.spark.sql.graftbridge.TopKPerKey.FlushKeysConf)
    // force the flush path hard: cap of 4 keys against 500 distinct keys
    spark.conf.set(
      org.apache.spark.sql.graftbridge.TopKPerKey.FlushKeysConf, "4")
    try {
      val df = spark.range(0, 20000, 1, 8)
        .select((col("id") % 500).as("k"),
          ((col("id") * 2654435761L) % 10007).as("v"))
      val got = TopKPerKey(df, Seq(col("k")), struct(col("v"), col("k")), 2)
        .select("k", "v").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted.toSeq }
      val exp = df.select("k", "v").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (k, vs) =>
          k -> vs.map(_._2).sorted.take(2).toSeq }
      assert(got === exp)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(
          org.apache.spark.sql.graftbridge.TopKPerKey.FlushKeysConf, v)
        case None => spark.conf.unset(
          org.apache.spark.sql.graftbridge.TopKPerKey.FlushKeysConf)
      }
    }
  }

  test("descending via negation, deterministic tiebreak") {
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 30.0))
      .toDF("k", "id", "s")
    val out = TopKPerKey(df, Seq(col("k")),
        struct((-col("s")).as("ns"), col("id")), 2)
      .select("id").as[Long].collect().toSet
    assert(out === Set(2L, 3L), "both 30s beat the 10; id breaks the tie")
  }
}

package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The conf-gated optimizer rule that turns naive point-in-interval joins
  * into bucketed equi-joins. */
class RangeJoinRewriteSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def points = Seq((1L, 5.0), (2L, 10.0), (3L, 99.0)).toDF("id", "p")
  private def ivals =
    Seq(("a", 0.0, 10.0), ("b", 4.0, 6.0), ("c", 9.0, 20.0))
      .toDF("name", "lo", "hi")

  private def naiveJoin =
    points.join(ivals, col("p") >= col("lo") && col("p") <= col("hi"))

  private def withRule[T](width: String)(body: => T): T = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved :+ RangeJoinRewrite
    spark.conf.set("spark.graft.rangeJoin.bucketWidth", width)
    try body
    finally {
      spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
      spark.experimental.extraOptimizations = saved
    }
  }

  test("rewrite preserves the naive join's result exactly") {
    val expected = naiveJoin.select("id", "name").as[(Long, String)]
      .collect().toSet
    val got = withRule("2.0") {
      naiveJoin.select("id", "name").as[(Long, String)].collect().toSet
    }
    assert(got == expected)
    assert(got == Set((1L, "a"), (1L, "b"), (2L, "a"), (2L, "c")))
  }

  test("rewrite replaces BroadcastNestedLoop with an equi-join") {
    val savedBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val before = naiveJoin.queryExecution.executedPlan.toString
      // with broadcast off the naive plan is the quadratic disaster in one
      // of its two shapes
      assert(before.contains("BroadcastNestedLoop") ||
        before.contains("CartesianProduct"), before)
      withRule("2.0") {
        val after = naiveJoin.queryExecution.executedPlan.toString
        assert(!after.contains("BroadcastNestedLoop"), after)
        assert(after.contains("SortMergeJoin") || after.contains("ShuffledHashJoin"),
          after)
      }
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
  }

  test("rule leaves equi-joins and unrelated conditions untouched") {
    withRule("2.0") {
      val eq = points.join(ivals, col("p") === col("lo"))
      assert(!eq.queryExecution.optimizedPlan.toString.contains("_graft_bucket"))
      // one-sided bound only: not a range join, no rewrite
      val half = points.join(ivals, col("p") >= col("lo"))
      assert(!half.queryExecution.optimizedPlan.toString.contains("_graft_bucket"))
    }
  }

  test("non-numeric range joins are left alone (and stay correct)") {
    // bucket() casts to double: a string range would bucket to NULL and
    // silently empty the join — the rule must bail out instead
    val names = Seq((1L, "carol"), (2L, "yak")).toDF("id", "n")
    val spans = Seq(("early", "a", "m"), ("late", "n", "z")).toDF("tag", "s", "e")
    val q = names.join(spans, col("n") >= col("s") && col("n") <= col("e"))
    val expected = Set((1L, "early"), (2L, "late"))
    withRule("2.0") {
      assert(!q.queryExecution.optimizedPlan.toString.contains("_graft_bucket"))
      assert(q.select("id", "tag").as[(Long, String)].collect().toSet == expected)
    }
  }

  test("an inverted interval (hi < lo) matches nothing instead of throwing") {
    val inverted = ivals.union(Seq(("bad", 50.0, 1.0)).toDF("name", "lo", "hi"))
    val q = points.join(inverted, col("p") >= col("lo") && col("p") <= col("hi"))
    withRule("2.0") {
      assert(q.queryExecution.optimizedPlan.toString.contains("_graft_bucket"))
      val got = q.select("id", "name").as[(Long, String)].collect().toSet
      assert(got == Set((1L, "a"), (1L, "b"), (2L, "a"), (2L, "c")))
    }
  }

  test("rule is a no-op when the width conf is unset") {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved :+ RangeJoinRewrite
    try {
      assert(!naiveJoin.queryExecution.optimizedPlan.toString
        .contains("_graft_bucket"))
    } finally spark.experimental.extraOptimizations = saved
  }
}

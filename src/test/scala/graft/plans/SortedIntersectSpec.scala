package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SortedIntersectSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("matches array_intersect on sorted duplicate-free inputs") {
    val rows = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(2L, 3L, 7L, 9L)),
      (Seq(1L, 2L), Seq(3L, 4L)),
      (Seq.empty[Long], Seq(1L)),
      (Seq(5L), Seq(5L)),
      (Seq(-3L, 0L, 4L), Seq(-3L, 4L, 8L)))
    val out = rows.toDF("a", "b")
      .select(
        NativeFunctions.sorted_intersect(col("a"), col("b")).as("mine"),
        array_intersect(col("a"), col("b")).as("builtin"))
      .as[(Seq[Long], Seq[Long])].collect()
    out.foreach { case (mine, builtin) => assert(mine === builtin) }
  }

  test("nulls propagate") {
    val r = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(NativeFunctions.sorted_intersect(col("a"), col("b")))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("interpreted path agrees with codegen") {
    val a = Seq(1L, 4L, 6L, 9L)
    val b = Seq(4L, 5L, 9L)
    val e = SortedIntersect(
      org.apache.spark.sql.catalyst.expressions.Literal.create(a,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(b,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
    val interp = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    assert(interp.toSeq === Seq(4L, 9L))
  }

  test("expression executes inside WholeStageCodegen (no fallback)") {
    val df = spark.range(100).select(
      NativeFunctions.sorted_intersect(
        array(col("id"), col("id") + 2, col("id") + 4),
        array(col("id") + 2, col("id") + 3, col("id") + 4)).as("zs"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("Project") && l.trim.startsWith("*(")),
      s"codegen fallback:\n$plan")
    val got = df.collect()
    assert(got.length == 100 && got.forall(_.getSeq[Long](0).length == 2))
  }

  test("registered SQL function evaluates") {
    NativeFunctions.register(spark)
    val out = spark.sql(
      "SELECT graft_sorted_intersect(array(1L, 2L, 5L), array(2L, 5L, 6L)) AS z")
      .as[Seq[Long]].head()
    assert(out === Seq(2L, 5L))
  }
}

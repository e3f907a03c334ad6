package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.TestSpark

/** Jaro-Winkler kernel against the published reference vectors and the
  * oracle engine's observed byte-level semantics. */
class JaroWinklerSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerKernel.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("reference vectors") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(jw("hello", "hello") == 1.0)
  }

  test("edge semantics match the oracle engine") {
    // empty inputs (including BOTH empty) score 0, not 1
    assert(jw("", "") == 0.0)
    assert(jw("a", "") == 0.0)
    // window 0 at len 2: adjacent swap finds no matches at all
    assert(jw("ab", "ba") == 0.0)
    // 3 differing matched positions -> transpositions = 3/2 = 1 (integer)
    assert(math.abs(jw("abcdef", "bcadef") - 0.9444444444444445) < 1e-15)
    // no Winkler boost at or below jaro 0.7 despite a 3-byte common prefix
    assert(math.abs(jw("abcdef", "abczzz") - 0.6666666666666666) < 1e-15)
    // byte-level: 'é' is two UTF-8 bytes, so m=5 of len 7 vs 6
    assert(math.abs(jw("éclair", "eclair") - 0.8492063492063492) < 1e-15)
  }

  test("prefix bonus caps at 4 bytes") {
    assert(math.abs(jw("abcdwxyz", "abcdzyxw") - 0.95) < 1e-15)
  }

  test("expression stays inside whole-stage codegen") {
    val df = spark.range(100).select(
      conv(col("id").cast("string"), 10, 36).as("x"),
      conv((col("id") * 7).cast("string"), 10, 36).as("y"))
    val q = df
      .select(NativeFunctions.jaro_winkler(col("x"), col("y")).as("j"))
      .filter(col("j") >= 0)
    q.write.mode("overwrite").format("noop").save()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("*(1) Filter"),
      s"codegen fallback:\n$plan")
  }

  test("SQL registration and Column API agree") {
    NativeFunctions.register(spark)
    Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"))
      .toDF("a", "b").createOrReplaceTempView("jw_pairs")
    val viaSql = spark.sql(
      "SELECT graft_jaro_winkler(a, b) FROM jw_pairs").as[Double].collect().toSeq
    val viaCol = spark.table("jw_pairs")
      .select(NativeFunctions.jaro_winkler(col("a"), col("b")))
      .as[Double].collect().toSeq
    assert(viaSql == viaCol)
  }
}

package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class NormalizeTextSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val composed = "caf\u00e9"      // e-acute as U+00E9
  private val decomposed = "cafe\u0301"   // e + combining acute U+0301

  test("NFC collapses composed/decomposed to identical strings") {
    val out = Seq((composed, decomposed)).toDF("c", "d")
      .select(
        NativeFunctions.normalize_text(col("c"), "NFC").as("nc"),
        NativeFunctions.normalize_text(col("d"), "NFC").as("nd"),
        NativeFunctions.normalize_text(col("c"), "NFD").as("dc"),
        NativeFunctions.normalize_text(col("d"), "NFD").as("dd"))
      .as[(String, String, String, String)].head()
    assert(composed != decomposed)
    assert(out._1 == out._2 && out._1 == composed, "NFC -> composed form")
    assert(out._3 == out._4 && out._3 == decomposed, "NFD -> decomposed form")
  }

  test("codegen and interpreted paths agree with java.text.Normalizer") {
    val inputs = Seq(composed, decomposed, "", "plain ascii",
      "ﬁle", "Å")  // fi-ligature (NFKC-only), A + ring
    val df = inputs.toDF("s")
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val got = df.select(col("s"),
          NativeFunctions.normalize_text(col("s"), form).as("n"))
        .as[(String, String)].collect().toMap
      inputs.foreach { s =>
        val want = java.text.Normalizer.normalize(s,
          java.text.Normalizer.Form.valueOf(form))
        assert(got(s) == want, s"form=$form input=$s")
      }
    }
  }

  test("expression executes inside WholeStageCodegen (no fallback)") {
    val df = spark.range(100).select(
      NativeFunctions.normalize_text(concat(lit(decomposed), col("id")), "NFC")
        .as("n"))
    // the '*(n)' prefix is the WholeStageCodegen marker in the compact
    // rendering; a codegen-incompatible expression loses it on its Project
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("Project") && l.trim.startsWith("*(")),
      s"codegen fallback:\n$plan")
    // and the generated code actually compiles + runs
    assert(df.collect().length == 100)
  }

  test("invalid form is rejected at construction; nulls propagate") {
    intercept[IllegalArgumentException] {
      NativeFunctions.normalize_text(lit("x"), "NFX")
    }
    val n = Seq(Option.empty[String]).toDF("s")
      .select(NativeFunctions.normalize_text(col("s"), "NFC"))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("registered SQL function evaluates with a literal form argument") {
    NativeFunctions.register(spark)
    val out = spark.sql(
      s"SELECT graft_normalize('café', 'NFC') AS n").as[String].head()
    assert(out == composed)
  }
}

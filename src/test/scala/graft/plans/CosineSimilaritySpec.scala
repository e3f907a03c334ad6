package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.SimilarityOps

class CosineSimilaritySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val vecs = Seq(
    (Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
    (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
    (Array(0.5f, -0.5f, 2f), Array(-1f, 3f, 0.25f))
  ).toDF("a", "b")

  test("native expression matches the HOF fold bit-for-bit") {
    val hof = SimilarityOps.dot(col("a"), col("b")) /
      (SimilarityOps.norm(col("a")) * SimilarityOps.norm(col("b")))
    val rows = vecs.select(
      NativeFunctions.cosine_similarity(col("a"), col("b")).as("native"),
      hof.as("fold")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("registered SQL function evaluates identically") {
    NativeFunctions.register(spark)
    vecs.createOrReplaceTempView("vecs_cs")
    val viaSql = spark.sql(
      "SELECT graft_cosine(a, b) AS c FROM vecs_cs").as[Double].collect()
    val viaCol = vecs.select(
      NativeFunctions.cosine_similarity(col("a"), col("b"))).as[Double].collect()
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("expression stays inside whole-stage codegen") {
    // LocalTableScan of literals never enters codegen — use a range-derived
    // plan, the shape a parquet scan produces
    val df = spark.range(100).select(
      array((0 to 3).map(i => (col("id") + i).cast("double")): _*).as("a"),
      array((0 to 3).map(i => (col("id") * i).cast("double")): _*).as("b"))
    val q = df
      .select(NativeFunctions.cosine_similarity(col("a"), col("b")).as("c"))
      .filter(col("c") > -2)
    q.write.mode("overwrite").format("noop").save()
    // the "*(n)" prefix is the WholeStageCodegen stage marker; a codegen
    // fallback would print bare "Project"/"Filter" nodes
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("*(1) Filter"))
  }

  test("graft_bloom_agg / graft_might_contain compose from SQL text") {
    NativeFunctions.register(spark)
    spark.range(1000).createOrReplaceTempView("keys_bf")
    val bf = spark.sql(
      """SELECT graft_bloom_agg(xxhash64(id), 1000L, 8000L) AS bf
         FROM keys_bf WHERE id % 2 = 0""").first().getAs[Array[Byte]]("bf")
    spark.createDataFrame(Seq(Tuple1(bf))).toDF("bf")
      .createOrReplaceTempView("bloom_bf")
    val hits = spark.sql(
      """SELECT count(*) FROM keys_bf
         WHERE graft_might_contain((SELECT bf FROM bloom_bf), xxhash64(id))
           AND id % 2 = 0""").first().getLong(0)
    // a bloom filter has no false negatives: all 500 even keys must probe true
    assert(hits == 500L)
  }

  test("graft_hamming stays inside whole-stage codegen") {
    val df = spark.range(100).select(
      conv(col("id").cast("string"), 10, 2).as("x"),
      conv((col("id") * 7).cast("string"), 10, 2).as("y"))
    val q = df
      .select(NativeFunctions.hamming_distance(col("x"), col("y")).as("h"))
      .filter(col("h") >= 0)
    q.write.mode("overwrite").format("noop").save()
    // "*(n)" prefixes = WholeStageCodegen stages; a fallback would print
    // bare Project/Filter nodes and silently interpret the hot loop
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("*(1) Filter"),
      s"codegen fallback:\n$plan")
  }

  test("graft_hamming on non-string columns fails at analysis, not runtime") {
    NativeFunctions.register(spark)
    spark.range(3).createOrReplaceTempView("nums_hd")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hamming(id, id) FROM nums_hd").collect()
    }
    assert(err.getMessage.toLowerCase.contains("type"))
  }

  test("known values") {
    val out = Seq((Array(1f, 0f), Array(1f, 0f)), (Array(1f, 0f), Array(-1f, 0f)))
      .toDF("a", "b")
      .select(NativeFunctions.cosine_similarity(col("a"), col("b")))
      .as[Double].collect()
    assert(out(0) == 1.0 && out(1) == -1.0)
  }
}

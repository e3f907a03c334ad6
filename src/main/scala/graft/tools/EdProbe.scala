package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe (r9): window vs native top-k for capPerGroup/invertedIndex. */
object EdProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.session("probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.core.Graft.table(spark, dir, "documents")
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label min=${ts.min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val ord = Seq(md5(col("doc_id").cast("string")), col("doc_id"))
    time("cap-native") {
      graft.operators.SortOps.topKPerKey(docs, Seq(col("source")),
        struct(ord: _*), 10).write.format("noop").mode("overwrite").save()
    }
    time("cap-window") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(ord: _*)
      docs.withColumn("_rank", row_number().over(w))
        .filter(col("_rank") <= 10).drop("_rank")
        .write.format("noop").mode("overwrite").save()
    }
    println(s"[probe] domains=${docs.select("source").distinct().count()} docs=${docs.count()}")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.TxLog

/** One-off decomposition of the masked-scan tax measured by [[DvProbe]]:
  * is it the `_metadata` coordinate columns, or the anti-join probe?
  * Builds the same 16-batch table + one DV delete, then times
  * (a) plain scan, (b) scan + metadata coordinate columns,
  * (c) the full masked scan. Backs the BENCH_SCALE dv read-tax note. */
object DvReadProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.session("dv-read-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale100")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val maxKey = li.agg(max("l_orderkey")).head().getLong(0)
    val width = maxKey / 16 + 1
    val root = "target/dv_read_probe"
    TxLog.destroy(root)
    (0 until 16).foreach { b =>
      TxLog.commitWithStats(root, Seq(TxLog.writeBatch(
        li.filter(floor(col("l_orderkey") / width) === b), root, s"b$b")
          -> None))
    }
    TxLog.deleteWhereDV(spark, root, "dv", col("l_partkey") % 199 === 0)
    val files = TxLog.liveFiles(root)
    def timed(tag: String)(body: => Any): Unit = (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      body
      println(f"[dvread] $tag r$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    timed("plain")(spark.read.parquet(files: _*)
      .agg(sum("l_quantity")).head())
    timed("with_meta")(spark.read.parquet(files: _*)
      .withColumn("_f", col("_metadata.file_path"))
      .withColumn("_p", col("_metadata.row_index"))
      .filter(col("_p") >= 0)
      .agg(sum("l_quantity")).head())
    timed("masked")(TxLog.read(spark, root)
      .agg(sum("l_quantity")).head())
    TxLog.destroy(root)
    spark.stop()
  }
}

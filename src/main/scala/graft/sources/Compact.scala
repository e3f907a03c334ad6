package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction: the useful core of the reference's HadoopArchives
  * / DistCp file-admin tools (reference: hadoop-tools/hadoop-archives
  * .../HadoopArchives.java:84, hadoop-tools/hadoop-distcp .../DistCp.java:59)
  * re-expressed as a rewrite job — read, coalesce to a target file size,
  * write. The 100TB version is identical: the listing is driver-side but
  * O(#files), the data movement is fully distributed. */
object Compact {

  /** Rewrite `inPath` (any spark.read-able format) into `outPath` as
    * ~`targetFileBytes`-sized parquet files. Returns the output file count. */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      format: String = "parquet",
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = new Path(inPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(new Path(inPath)).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val df = format match {
      case "parquet" => spark.read.parquet(inPath)
      case "text"    => spark.read.text(inPath)
      case other     => spark.read.format(other).load(inPath)
    }
    df.repartition(nFiles).write.mode("overwrite").parquet(outPath)
    val outFs = new Path(outPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    outFs.listStatus(new Path(outPath))
      .count(f => f.getPath.getName.startsWith("part-"))
  }
}

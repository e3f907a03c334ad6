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

  /** DistCp `-update` semantics (reference: hadoop-tools/hadoop-distcp
    * .../DistCp.java:59, sync logic in DistCpSync.java): copy only files
    * missing from `dst` or differing in size — the incremental bulk-movement
    * primitive. Same shape as the reference: the LISTING is driver-side and
    * O(#files); the byte movement is distributed (each task copies its slice
    * of the file list). Returns (copied, skipped). */
  def sync(spark: SparkSession, src: String, dst: String): (Long, Long) = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val srcPath = new Path(src)
    val dstPath = new Path(dst)
    val srcFs = srcPath.getFileSystem(hconf)
    val dstFs = dstPath.getFileSystem(hconf)
    dstFs.mkdirs(dstPath)
    val srcFiles = srcFs.listStatus(srcPath).filter(_.isFile)
      .map(f => (f.getPath.getName, f.getLen))
    val dstSizes = dstFs.listStatus(dstPath).filter(_.isFile)
      .map(f => f.getPath.getName -> f.getLen).toMap
    val toCopy = srcFiles.collect {
      case (name, len) if !dstSizes.get(name).contains(len) => name
    }
    if (toCopy.nonEmpty) {
      val (srcStr, dstStr) = (src, dst)
      // ship the DRIVER's Hadoop conf to the copy tasks (Configuration is
      // not serializable directly — SerializableConfiguration wraps it):
      // a fresh Configuration() would drop every spark.hadoop.* setting
      // (object-store credentials, custom fs impls, defaultFS), making
      // sync() resolve the wrong filesystem anywhere beyond the local FS
      val confBc = spark.sparkContext.broadcast(
        new org.apache.spark.util.SerializableConfiguration(hconf))
      spark.sparkContext
        .parallelize(toCopy.toSeq, math.max(1, math.min(toCopy.length, 32)))
        .foreachPartition { names =>
          val conf = confBc.value.value
          val sp = new Path(srcStr)
          val dp = new Path(dstStr)
          val sFs = sp.getFileSystem(conf)
          val dFs = dp.getFileSystem(conf)
          names.foreach { n =>
            org.apache.hadoop.fs.FileUtil.copy(
              sFs, new Path(sp, n), dFs, new Path(dp, n),
              false /* deleteSource */, true /* overwrite */, conf)
          }
        }
    }
    (toCopy.length.toLong, (srcFiles.length - toCopy.length).toLong)
  }
}

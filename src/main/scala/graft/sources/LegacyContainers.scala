package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Read-side interop for the reference's sorted key-value containers, so a
  * user with EXISTING MapFile/BloomMapFile/TFile data can scan it without a
  * migration step (reference: COMMON-IO io/MapFile.java:59,
  * io/BloomMapFile.java:49, io/file/tfile/TFile.java).
  *
  * Only the read path is provided: the engine's own storage is parquet
  * (stats + bucketing replace the index/bloom sidecars — capability gates
  * q_bucket_lookup and q_bloom_join), and these formats' write paths exist
  * solely to feed the reference runtime. Migration = read here, write
  * parquet.
  */
object LegacyContainers {

  /** MapFile/BloomMapFile directory → DataFrame(key, value).
    *
    * A MapFile is a directory whose `data` member IS a sorted Text-keyed
    * SequenceFile; `index` (and BloomMapFile's `bloom`) are lookup
    * sidecars. The scan therefore rides Spark's ordinary SPLITTABLE
    * SequenceFile path over `data` and ignores the sidecars — at 100 TB
    * each container splits across tasks like any other SequenceFile, and
    * point lookups belong to the bucketed-parquet path, not this one. */
  def readMapFile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.sequenceFile[String, String](s"$dir/data")
      .toDF("key", "value")
  }

  /** TFile glob → DataFrame(key, value), keys/values decoded as UTF-8.
    *
    * TFile never shipped a public InputFormat, so each matched file is
    * scanned whole by one task (files parallelize across the cluster; a
    * single container does not split). That is the right shape for what
    * TFile reads are — one-shot migration/ingest of legacy data — and a
    * deliberate non-goal for query workloads: re-land as parquet first. */
  def readTFile(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    val sconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fs = new Path(glob).getFileSystem(sconf.value)
    // globStatus returns NULL (not empty) for a non-matching literal path
    val files = Option(fs.globStatus(new Path(glob)))
      .getOrElse(Array.empty)
      .filter(_.isFile)
      .map(st => (st.getPath.toString, st.getLen))
      .toSeq
    spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .flatMap { case (p, len) =>
        val path = new Path(p)
        val in = path.getFileSystem(sconf.value).open(path)
        val reader = new org.apache.hadoop.io.file.tfile.TFile.Reader(
          in, len, sconf.value)
        val scanner = reader.createScanner()
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        try {
          while (!scanner.atEnd()) {
            val e = scanner.entry()
            val k = new Array[Byte](e.getKeyLength)
            e.getKey(k)
            val v = new Array[Byte](e.getValueLength)
            e.getValue(v)
            out += ((new String(k, "UTF-8"), new String(v, "UTF-8")))
            scanner.advance()
          }
        } finally {
          scanner.close(); reader.close(); in.close()
        }
        out
      }
      .toDF("key", "value")
  }
}

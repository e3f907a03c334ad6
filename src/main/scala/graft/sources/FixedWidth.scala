package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-length binary record scan, parity with the reference's
  * FixedLengthInputFormat (reference: hadoop-mapreduce-client-core
  * .../lib/input/FixedLengthInputFormat.java:47,
  * FixedLengthRecordReader.java:50): constant-width records, no delimiters.
  *
  * Implementation: binaryFile source + an explode over record offsets — the
  * slicing is a codegen'd expression. Files are the split unit here (adequate
  * for many medium files); a 100TB single-file corpus would use a custom
  * DataSourceV2 with intra-file offset splits instead.
  */
object FixedWidth {

  /** One row per fixed-width record: (path, idx, record: binary). */
  def read(spark: SparkSession, path: String, width: Int): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .select(col("path"),
        posexplode(
          transform(
            sequence(lit(0L), (length(col("content")) / width).cast("long") - 1),
            i => substring(col("content"), (i * width + 1).cast("int"), lit(width)))))
      .withColumnRenamed("pos", "idx")
      .withColumnRenamed("col", "record")

  /** Text view of fixed-width records (TeraSort-style 100-byte rows with a
    * leading key region): record -> (key, value) strings. */
  def readKv(spark: SparkSession, path: String, width: Int, keyWidth: Int): DataFrame =
    read(spark, path, width).select(
      col("path"), col("idx"),
      decode(substring(col("record"), 1, keyWidth), "UTF-8").as("key"),
      decode(substring(col("record"), keyWidth + 1, width - keyWidth), "UTF-8").as("value"))
}

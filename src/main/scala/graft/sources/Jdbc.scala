package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC connector surface (SURVEY §2.9). The reference's DBInputFormat /
  * DataDrivenDBInputFormat compute per-task bounding queries
  * (`WHERE col BETWEEN lo AND hi` from min/max) — Spark's partitioned
  * `read.jdbc` implements the identical strategy, with dialects built in
  * (reference: hadoop-mapreduce-client-core .../lib/db/DBInputFormat.java:61,
  * DataDrivenDBInputFormat.java:61, splitters IntegerSplitter.java /
  * TextSplitter.java / DateSplitter.java; writer DBOutputFormat.java:50).
  *
  * Thin facade so the engine's source/sink API is uniform; no live database
  * exists in this environment, so this is surface + documentation (the
  * underlying implementation is stock Spark, exercised by Spark's own
  * tests).
  */
object Jdbc {

  /** Parallel partitioned scan: DataDrivenDBInputFormat parity. */
  def read(
      spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props)

  /** Single-query scan (DBInputFormat without splits). */
  def readOne(spark: SparkSession, url: String, table: String,
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Batched-insert sink: DBOutputFormat parity. */
  def write(df: DataFrame, url: String, table: String, mode: String = "append",
      props: java.util.Properties = new java.util.Properties()): Unit =
    df.write.mode(mode).jdbc(url, table, props)
}

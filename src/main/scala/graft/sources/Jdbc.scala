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

  /** Date-bounded partitioned scan (DateSplitter parity, reference:
    * hadoop-mapreduce-client-core .../lib/db/DateSplitter.java:178): the
    * [lower, upper] date range strides into `numPartitions` per-task
    * bounding queries. As in the reference, rows outside the bounds still
    * arrive — they fall into the first/last split's open-ended predicate —
    * so the bounds tune parallelism, never correctness. */
  def readDatePartitioned(
      spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerDate: String, upperDate: String,
      numPartitions: Int,
      props: java.util.Properties = new java.util.Properties()): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerDate)
      .option("upperBound", upperDate)
      .option("numPartitions", numPartitions.toString)
    props.stringPropertyNames().forEach(k => r.option(k, props.getProperty(k)))
    r.load()
  }

  /** Split-by-predicates scan — the raw DataDrivenDBInputFormat contract
    * (reference: .../lib/db/DataDrivenDBInputFormat.java:61, one WHERE
    * clause per task). The caller guarantees the predicates are disjoint
    * and covering; [[stringRangePredicates]] builds such a set for text
    * columns. */
  def readPredicates(
      spark: SparkSession, url: String, table: String,
      predicates: Seq[String],
      props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, predicates.toArray, props)

  /** Lexicographic split predicates for a string column (TextSplitter
    * parity, reference: .../lib/db/TextSplitter.java:221): sorted
    * boundaries become disjoint covering ranges, with NULLs riding in the
    * first split — the reference emits the same shape from its min/max
    * string walk. */
  def stringRangePredicates(column: String, boundaries: Seq[String]): Seq[String] = {
    require(boundaries.nonEmpty && boundaries == boundaries.sorted &&
      boundaries.distinct == boundaries,
      s"boundaries must be sorted and distinct: $boundaries")
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    val first = s"$column IS NULL OR $column < ${q(boundaries.head)}"
    val mids = boundaries.sliding(2).collect { case Seq(a, b) =>
      s"$column >= ${q(a)} AND $column < ${q(b)}"
    }.toSeq
    val last = s"$column >= ${q(boundaries.last)}"
    (first +: mids) :+ last
  }

  /** Batched-insert sink: DBOutputFormat parity. */
  def write(df: DataFrame, url: String, table: String, mode: String = "append",
      props: java.util.Properties = new java.util.Properties()): Unit =
    df.write.mode(mode).jdbc(url, table, props)
}

package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gray-sort-shaped generate / sort / validate suite, parity with the
  * reference's terasort package (reference: hadoop-mapreduce-examples
  * .../examples/terasort/TeraGen.java:68, TeraSort.java:49,
  * TeraValidate.java:53, TeraChecksum.java:37).
  *
  * Records are deterministic md5-derived (10-byte keys as 20 hex chars) so
  * any engine can regenerate the dataset exactly — the validate query is
  * oracle-checkable end to end. The sort is `repartitionByRange` +
  * `sortWithinPartitions` (Spark's TotalOrderPartitioner + per-reducer sort),
  * and validation follows the reference's two-level architecture: per-task
  * summaries (first/last key, in-partition violations, checksum) + a tiny
  * job-level combine across partition boundaries.
  */
object Tera {

  /** TeraGen parity: row i -> (key: 20 hex chars, value: 32 hex chars, id).
    * `spark.range` splits the row range across `parts` tasks exactly like
    * the reference's RangeInputFormat (TeraGen.java:76). */
  def gen(spark: SparkSession, n: Long, parts: Int = 32): DataFrame =
    spark.range(0, n, 1, parts).select(
      substring(md5(concat(col("id").cast("string"), lit(":k"))), 1, 20).as("key"),
      md5(concat(col("id").cast("string"), lit(":v"))).as("value"),
      col("id"))

  /** TeraSort parity: total order by (key, id). */
  def sort(df: DataFrame): DataFrame =
    df.repartitionByRange(col("key"), col("id"))
      .sortWithinPartitions(col("key"), col("id"))

  private val Mod = 1000000007L

  /** Per-record checksum term: first 14 hex chars of md5(key||value) as a
    * long, mod 1e9+7 (so a 100TB sum still fits a long). Identical SQL:
    * CAST('0x'||substr(md5(key||value),1,14) AS BIGINT) % 1000000007. */
  private def checksumTerm(key: String, value: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest((key + value).getBytes("UTF-8"))
    // first 14 hex chars = top 7 bytes, folded numerically (no string
    // round-trip: the per-byte f"%02x" Formatter this replaces was a
    // measured per-record hot spot in the r12 kernel profiling)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v % Mod
  }

  /** TeraValidate + TeraChecksum parity: one output row
    * (n_records, n_violations, checksum). Violations = adjacent out-of-order
    * pairs, counted inside each partition plus across partition boundaries
    * (driver only sees one tiny summary per partition — no global window). */
  def validate(sorted: DataFrame): DataFrame = {
    val spark = sorted.sparkSession
    val summaries = sorted
      .select("key", "value")
      .rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        var first: String = null
        var last: String = null
        var cnt = 0L
        var violations = 0L
        var checksum = 0L
        it.foreach { r =>
          val k = r.getString(0)
          if (first == null) first = k
          if (last != null && last > k) violations += 1
          last = k
          cnt += 1
          checksum = (checksum + checksumTerm(k, r.getString(1))) % Mod
        }
        if (cnt == 0) Iterator.empty
        else Iterator((pid, first, last, cnt, violations, checksum))
      }
      .collect()
      .sortBy(_._1)
    val boundaryViolations = summaries.sliding(2).count {
      case Array(a, b) => a._3 > b._2 // prev partition's last > next's first
      case _           => false
    }
    val row = Row(
      summaries.map(_._4).sum,
      summaries.map(_._5).sum + boundaryViolations,
      summaries.map(_._6).foldLeft(0L)((a, b) => (a + b) % Mod))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row), 1),
      StructType(Seq(
        StructField("n_records", LongType, nullable = false),
        StructField("n_violations", LongType, nullable = false),
        StructField("checksum", LongType, nullable = false))))
  }
}

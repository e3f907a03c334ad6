package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** External-process UDF surface: Hadoop Streaming parity (SURVEY §2.10).
  *
  * The reference forks the user's executable per task and frames records as
  * separator-joined text lines over stdin/stdout (reference:
  * hadoop-tools/hadoop-streaming .../PipeMapper.java:38,79-81,
  * .../PipeReducer.java:40, CLI .../StreamJob.java:275-360). Here:
  * `rdd.pipe(cmd, env)` inside an otherwise-normal DataFrame pipeline. One
  * process per partition (the reference paid one per task — same economics).
  */
object PipeOps {

  /** pipeMap: rows -> sep-joined lines -> external command -> output lines.
    * Returns a one-column DataFrame (`line`); compose with a parser (split +
    * element_at) to restore schema, mirroring how a streaming mapper's stdout
    * was re-split on the separator. */
  def pipeMap(
      df: DataFrame,
      cmd: Seq[String],
      sep: String = "\t",
      env: Map[String, String] = Map.empty): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lines = df
      .select(concat_ws(sep, df.columns.map(col): _*).as("line"))
      .as[String]
    lines.rdd.pipe(cmd, env).toDF("line")
  }

  /** pipeReduce: the streaming-reducer contract — rows arrive at the command
    * grouped by key and ordered within the partition, so consecutive lines
    * with the same key form one group (reference: PipeReducer relies on the
    * MR shuffle's sorted stream). Reproduced with repartition(key) +
    * sortWithinPartitions before the pipe. */
  def pipeReduce(
      df: DataFrame,
      keyCols: Seq[String],
      cmd: Seq[String],
      sep: String = "\t",
      env: Map[String, String] = Map.empty): DataFrame = {
    val grouped = df
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions(df.columns.map(col): _*)
    pipeMap(grouped, cmd, sep, env)
  }

  /** Binary-safe piping (typed-bytes parity, reference: hadoop-tools/
    * hadoop-streaming .../typedbytes/Type.java, TypedBytesInput.java:46):
    * the reference frames binary records as length-prefixed typed blobs so
    * payloads containing the separator or newlines survive the pipe intact.
    * `rdd.pipe` is line-oriented, so the equivalent safe framing here is
    * base64-per-cell: every column encodes to a base64 token (no raw bytes
    * ever reach the stream), tokens join on `sep`, and
    * [[parseBinary]] decodes the command's stdout back to binary cells.
    * Columns of any type are accepted; non-binary ones frame as the bytes
    * of their string form. */
  def pipeMapBinary(
      df: DataFrame,
      cmd: Seq[String],
      sep: String = "\t",
      env: Map[String, String] = Map.empty): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val framed = df.select(concat_ws(sep, df.columns.map { c =>
      val typ = df.schema(c).dataType
      val bin =
        if (typ == org.apache.spark.sql.types.BinaryType) col(c)
        else col(c).cast("string").cast("binary")
      base64(bin)
    }: _*).as("line")).as[String]
    framed.rdd.pipe(cmd, env).toDF("line")
  }

  /** Decode a base64-framed pipe output line (from [[pipeMapBinary]]'s
    * contract) back into named binary columns. */
  def parseBinary(
      lines: DataFrame, cols: Seq[String], sep: String = "\t"): DataFrame = {
    val parts = split(col("line"), java.util.regex.Pattern.quote(sep))
    lines.select(cols.zipWithIndex.map { case (n, i) =>
      unbase64(element_at(parts, i + 1)).as(n)
    }: _*)
  }

  /** Parse pipe output lines back to (key, value) on the first separator —
    * the reference's stream.num.map.output.key.fields=1 default framing. */
  def parseKv(lines: DataFrame, sep: String = "\t"): DataFrame = {
    val p = java.util.regex.Pattern.quote(sep)
    lines.select(
      regexp_extract(col("line"), s"^([^$sep]*)", 1).as("key"),
      when(col("line").contains(sep),
        regexp_replace(col("line"), s"^[^$sep]*$p", "")).otherwise(lit(""))
        .as("value"))
  }
}

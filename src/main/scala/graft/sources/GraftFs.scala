package graft.sources

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.spark.sql.SparkSession

/** A non-`file:` Hadoop FileSystem scheme served by the local filesystem —
  * the object-store-shaped read path (reference: hadoop-tools/hadoop-aws
  * .../s3a/S3AFileSystem.java:261, hadoop-azure .../NativeAzureFileSystem
  * .java — cloud connectors are exactly this: a scheme name bound to a
  * `FileSystem` impl via `fs.<scheme>.impl`, resolved per-URI by every task).
  *
  * Registering `graftfs://` and reading through it exercises the entire
  * scheme-dispatch stack a 100 TB object-store deployment relies on:
  * URI → impl-class lookup, per-scheme FileSystem cache, split listing,
  * footer + column reads — everything except the vendor SDK at the bottom.
  * Swapping in a real connector is a config change (`fs.s3a.impl` + jars),
  * not a code change, which is the claim this class makes testable.
  */
class GraftFileSystem extends RawLocalFileSystem {
  override def getScheme: String = GraftFileSystem.Scheme
  override def getUri: URI = URI.create(s"${GraftFileSystem.Scheme}:///")
}

object GraftFileSystem {
  val Scheme = "graftfs"

  /** Bind the scheme on the session's Hadoop conf (ships to executors with
    * each scan). Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sparkContext.hadoopConfiguration.set(
      s"fs.$Scheme.impl", classOf[GraftFileSystem].getName)

  /** file-absolute path -> scheme URI, e.g. /data/x.parquet ->
    * graftfs:///data/x.parquet */
  def uri(absolutePath: String): String = {
    require(absolutePath.startsWith("/"), s"need an absolute path: $absolutePath")
    s"$Scheme://$absolutePath"
  }
}

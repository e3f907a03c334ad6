package graft.tools

import org.apache.spark.sql.functions._

/** r11 probe (VERDICT r10 item 3): bytes-per-doc of the persisted MinHash
  * signature store, before (shingle strings) vs after (xxhash64 digests).
  * Writes both forms of the store for the same corpus as parquet and
  * reports on-disk bytes — the number behind the BENCH_SCALE
  * `sigstore_bytes_r11` row.
  *
  * Usage: runMain graft.tools.SigStoreProbe
  *   SPARK_GRAFT_SF_DIR overrides the corpus dir (default sf0.1).
  */
object SigStoreProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.session("sigstore-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.core.Graft.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    def bytesOf(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
        else f.length()
      walk(new java.io.File(p))
    }
    def rm(p: String): Unit = {
      val f = new java.io.File(p)
      if (f.exists()) {
        java.nio.file.Files.walk(f.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(q => { java.nio.file.Files.delete(q); () })
      }
    }
    val oldOut = "target/sigstore_probe_shingles"
    val newOut = "target/sigstore_probe_digests"
    rm(oldOut); rm(newOut)
    // the r10 store shape: full shingle strings ride in every row
    graft.operators.DedupOps.shingleSignatures(docs,
        col("doc_id"), col("text"), 5, 8)
      .write.mode("overwrite").parquet(oldOut)
    // the r11 store shape: 8-byte digests
    graft.operators.DedupOps.minhashSignatures(docs,
        col("doc_id"), col("text"), 5, 4, 2)
      .write.mode("overwrite").parquet(newOut)
    val ob = bytesOf(oldOut); val nb = bytesOf(newOut)
    // raw payload bytes (what actually rides through the verify joins'
    // shuffles and in-memory rows — parquet's dictionary coding flatters
    // the on-disk string number for short repeated-token docs)
    val raw = spark.read.parquet(oldOut)
      .select(
        aggregate(transform(col("shingles"), s => octet_length(s)),
          lit(0L), (a, x) => a + x).as("sb"),
        (size(col("shingles")) * 8L).as("db"))
      .agg(sum(col("sb")).as("sb"), sum(col("db")).as("db")).head()
    val (rawS, rawD) = (raw.getLong(0), raw.getLong(1))
    println(f"[sigstore] docs=$n shingle_store=${ob}B (${ob.toDouble / n}%.0f B/doc) " +
      f"digest_store=${nb}B (${nb.toDouble / n}%.0f B/doc) disk_ratio=${ob.toDouble / nb}%.2fx " +
      f"raw_shingle_payload=${rawS}B raw_digest_payload=${rawD}B raw_ratio=${rawS.toDouble / rawD}%.2fx")
    spark.stop()
  }
}

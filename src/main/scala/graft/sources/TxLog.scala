package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal transaction-log table format — the lakehouse manifest pattern
  * (a Delta-style `_txlog/` of versioned JSON commits over immutable
  * parquet data files), built from public parts only: each commit is a
  * file `_txlog/v%08d.json` whose lines are `add\tpath` / `remove\tpath`
  * actions; a snapshot at version V is "every path added and not yet
  * removed in commits 1..V". That one structure buys the three lakehouse
  * properties batch pipelines actually use:
  *
  *  - **atomic multi-file commits** — readers see all of a commit's files
  *    or none, because visibility flips with the single manifest-file
  *    create (written to a temp name, then atomically renamed in);
  *  - **snapshot isolation** — a reader resolves its file list against
  *    one version and is immune to concurrent appends/compactions;
  *  - **time travel** — `read(dir, asOf = V)` replays the log prefix.
  *
  * Compaction is an ordinary commit (`add` the compacted file, `remove`
  * the inputs) — content-neutral by construction, which the gate query
  * checks by hashing snapshots before and after.
  *
  * Single-writer versioning: the version counter advances by the atomic
  * create-if-absent of the next manifest; a losing writer fails its
  * commit rather than corrupting history (optimistic concurrency, the
  * standard manifest-log discipline).
  *
  * Scale: the log holds FILE names, not row data — a snapshot resolve
  * reads K tiny manifests; the data plane stays ordinary parquet scans
  * with all pushdown/pruning intact ([[graft.core.Graft]] sources).
  */
object TxLog {

  private def logDir(dir: String) = new java.io.File(dir, "_txlog")

  private def manifest(dir: String, v: Int) =
    new java.io.File(logDir(dir), f"v$v%08d.json")

  /** Highest committed version, 0 when the table is empty. */
  def latestVersion(dir: String): Int = {
    val ld = logDir(dir)
    if (!ld.isDirectory) 0
    else ld.listFiles()
      .map(_.getName)
      .collect { case n if n.matches("v\\d{8}\\.json") =>
        n.substring(1, 9).toInt }
      .foldLeft(0)(math.max)
  }

  /** Atomically commit a set of file additions/removals; returns the new
    * version. Fails (IllegalStateException) if another writer won the
    * version — retry with a fresh read of [[latestVersion]]. */
  def commit(dir: String, add: Seq[String], remove: Seq[String] = Nil): Int = {
    val ld = logDir(dir)
    ld.mkdirs()
    val v = latestVersion(dir) + 1
    val target = manifest(dir, v)
    val tmp = new java.io.File(ld, s".v$v.tmp${System.nanoTime()}")
    val body = (add.map(p => s"add\t$p") ++ remove.map(p => s"remove\t$p"))
      .mkString("", "\n", "\n")
    java.nio.file.Files.write(tmp.toPath, body.getBytes("UTF-8"))
    // createNewFile-style atomicity: rename fails if the target exists
    val ok = try {
      java.nio.file.Files.move(tmp.toPath, target.toPath)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    }
    if (!ok) {
      tmp.delete()
      throw new IllegalStateException(
        s"txlog: lost the race for version $v of $dir — re-read and retry")
    }
    v
  }

  /** The live file set at `asOf` (latest when <= 0): replay adds minus
    * removes over the manifest prefix, order-preserving. */
  def liveFiles(dir: String, asOf: Int = -1): Seq[String] = {
    val upTo = if (asOf <= 0) latestVersion(dir) else asOf
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    (1 to upTo).foreach { v =>
      val m = manifest(dir, v)
      if (!m.isFile)
        throw new IllegalStateException(
          s"txlog: missing manifest v$v of $dir (asked for asOf=$asOf)")
      scala.io.Source.fromFile(m, "UTF-8").getLines().foreach { line =>
        line.split("\t", 2) match {
          case Array("add", p)    => live += p
          case Array("remove", p) => live -= p
          case _ if line.trim.isEmpty =>
          case other =>
            throw new IllegalStateException(
              s"txlog: bad action line '${other.mkString("\t")}' in v$v")
        }
      }
    }
    live.toSeq
  }

  /** Snapshot read — all live parquet files as one DataFrame; empty
    * snapshot of a known schema reads as an empty frame of that schema
    * via the caller providing at least one committed version. */
  def read(spark: SparkSession, dir: String, asOf: Int = -1): DataFrame = {
    val files = liveFiles(dir, asOf)
    require(files.nonEmpty,
      s"txlog: snapshot of $dir at asOf=$asOf holds no files")
    spark.read.parquet(files: _*)
  }

  /** Drop the whole table — data files and log. (Test/rebuild helper;
    * production tables are append-only and never need it.) */
  def destroy(dir: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(dir))
  }

  /** Write `df` as one new immutable data file set under `dir/data/$name`
    * and return its path (commit separately — a batch is not visible
    * until its commit lands). */
  def writeBatch(df: DataFrame, dir: String, name: String): String = {
    val path = s"$dir/data/$name"
    df.write.mode("errorifexists").parquet(path)
    path
  }
}

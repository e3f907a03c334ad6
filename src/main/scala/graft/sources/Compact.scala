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
  /** Distributed copy of `names` from `src` to `dst` — the shared byte
    * mover under [[sync]]/[[syncDiff]]/[[syncAtomic]]: each task copies
    * its slice of the file list with the DRIVER's Hadoop conf. */
  private def copyFiles(spark: SparkSession, src: String, dst: String,
      names: Seq[String]): Unit = {
    if (names.isEmpty) return
    val hconf = spark.sparkContext.hadoopConfiguration
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(hconf))
    spark.sparkContext
      .parallelize(names, math.max(1, math.min(names.length, 32)))
      .foreachPartition { ns =>
        val conf = confBc.value.value
        val sp = new Path(src)
        val dp = new Path(dst)
        val sFs = sp.getFileSystem(conf)
        val dFs = dp.getFileSystem(conf)
        ns.foreach { n =>
          org.apache.hadoop.fs.FileUtil.copy(
            sFs, new Path(sp, n), dFs, new Path(dp, n),
            false /* deleteSource */, true /* overwrite */, conf)
        }
      }
  }

  /** Record a SNAPSHOT of `dir`: its (name, length, mtime) listing as
    * one tab-separated file — the role HDFS snapshots play for the
    * reference's DistCpSync (DistCpSync.java works off a
    * SnapshotDiffReport between two named HDFS snapshots; on
    * filesystems without snapshots, a recorded listing is the portable
    * equivalent of the from-snapshot). O(#files) driver-side, like
    * every DistCp listing. Returns the file count recorded. */
  def snapshot(spark: SparkSession, dir: String, snapFile: String): Long = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new Path(dir)
    val fs = p.getFileSystem(hconf)
    val entries = fs.listStatus(p).filter(_.isFile)
      .map(f => s"${f.getPath.getName}\t${f.getLen}\t${f.getModificationTime}")
      .sorted
    val sp = new Path(snapFile)
    val sfs = sp.getFileSystem(hconf)
    val out = sfs.create(sp, true)
    try out.write((entries.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    entries.length.toLong
  }

  /** DistCp `-diff` semantics (reference: hadoop-tools/hadoop-distcp
    * .../DistCpSync.java): apply the CHANGED SET between the recorded
    * from-snapshot (`snapFile`, see [[snapshot]]) and the live `src`
    * listing to `dst` — created/modified files copy, deleted files
    * delete at the target, untouched files are never even STATted
    * there. On a mutating 100 TB tree that is the whole point: work is
    * O(changes) + one source listing, not an O(#files) target compare
    * per sync. Like the reference's preSyncCheck ("no changes have been
    * made on the target since s1"), the target is verified AT THE
    * TOUCHED NAMES against the from-snapshot first; if it drifted, the
    * diff cannot be applied soundly and the call FALLS BACK to the full
    * [[sync]] compare — exactly the reference's fallback-to-default-
    * DistCp behavior. Renames degrade to delete+copy: inode-level
    * rename tracking is an HDFS-snapshot facility a listing snapshot
    * cannot see. Returns (copied, deleted, skipped, usedFallback). */
  def syncDiff(spark: SparkSession, src: String, dst: String,
      snapFile: String): (Long, Long, Long, Boolean) = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val srcPath = new Path(src)
    val dstPath = new Path(dst)
    val srcFs = srcPath.getFileSystem(hconf)
    val dstFs = dstPath.getFileSystem(hconf)
    dstFs.mkdirs(dstPath)
    val sp = new Path(snapFile)
    val sfs = sp.getFileSystem(hconf)
    val snapLines = {
      val in = sfs.open(sp)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    }
    val snap = snapLines.filter(_.nonEmpty).map { l =>
      val Array(n, len, mtime) = l.split("\t", 3)
      n -> (len.toLong, mtime.toLong)
    }.toMap
    val live = srcFs.listStatus(srcPath).filter(_.isFile)
      .map(f => f.getPath.getName ->
        (f.getLen, f.getModificationTime)).toMap
    val created = (live.keySet -- snap.keySet).toSeq.sorted
    val deleted = (snap.keySet -- live.keySet).toSeq.sorted
    val modified = live.keysIterator
      .filter(n => snap.get(n).exists(_ != live(n))).toSeq.sorted
    val skipped = (live.size - created.size - modified.size).toLong
    // preSyncCheck at the touched names: every file the diff will
    // delete or overwrite must still carry the from-snapshot's length
    // at the target, and a created name must be absent there
    val drifted =
      (deleted ++ modified).exists { n =>
        val st = try Some(dstFs.getFileStatus(new Path(dstPath, n)))
                 catch { case _: java.io.FileNotFoundException => None }
        !st.exists(_.getLen == snap(n)._1)
      } || created.exists(n => dstFs.exists(new Path(dstPath, n)))
    if (drifted) {
      val (c, s) = sync(spark, src, dst)
      // the full compare also repairs deletions the diff knew about
      deleted.foreach(n => dstFs.delete(new Path(dstPath, n), false))
      (c, deleted.size.toLong, s, true)
    } else {
      copyFiles(spark, src, dst, created ++ modified)
      deleted.foreach(n => dstFs.delete(new Path(dstPath, n), false))
      ((created.size + modified.size).toLong, deleted.size.toLong,
        skipped, false)
    }
  }

  /** DistCp `-atomic` semantics (reference: DistCp.java:59 atomic-commit
    * option): the whole copy lands in a staging directory next to the
    * target, then ONE rename publishes it — a reader never observes a
    * half-copied tree, and a failed copy leaves the namespace untouched.
    * Refuses an existing target (the all-or-nothing contract). Returns
    * the copied file count. */
  def syncAtomic(spark: SparkSession, src: String, dst: String): Long = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val dstPath = new Path(dst)
    val dstFs = dstPath.getFileSystem(hconf)
    require(!dstFs.exists(dstPath),
      s"distcp -atomic: target $dst already exists — atomic commit is " +
        "create-only (sync into an existing tree with sync/syncDiff)")
    val staging = new Path(dst + s"__staging_${System.nanoTime()}")
    val srcPath = new Path(src)
    val srcFs = srcPath.getFileSystem(hconf)
    val names = srcFs.listStatus(srcPath).filter(_.isFile)
      .map(_.getPath.getName).toSeq.sorted
    dstFs.mkdirs(staging)
    try {
      copyFiles(spark, src, staging.toString, names)
      require(dstFs.rename(staging, dstPath),
        s"distcp -atomic: commit rename $staging -> $dst failed")
    } catch {
      case e: Throwable => dstFs.delete(staging, true); throw e
    }
    names.length.toLong
  }

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
    // copyFiles ships the DRIVER's Hadoop conf to the copy tasks
    // (Configuration is not serializable directly —
    // SerializableConfiguration wraps it): a fresh Configuration()
    // would drop every spark.hadoop.* setting (object-store
    // credentials, custom fs impls, defaultFS), making sync() resolve
    // the wrong filesystem anywhere beyond the local FS
    copyFiles(spark, src, dst, toCopy.toSeq)
    (toCopy.length.toLong, (srcFiles.length - toCopy.length).toLong)
  }
}

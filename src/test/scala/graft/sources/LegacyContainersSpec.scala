package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Read interop against containers authored by the GENUINE Hadoop writers
  * — MapFile, BloomMapFile (same dir layout + bloom sidecar), TFile. */
class LegacyContainersSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val conf = spark.sparkContext.hadoopConfiguration
  private val kvs = (1 to 50).map(i => (f"k$i%04d", s"v$i"))

  test("readMapFile scans MapFile and BloomMapFile dirs") {
    import org.apache.hadoop.io.{BloomMapFile, MapFile, Text}
    val base = java.nio.file.Files.createTempDirectory("graft-legacy").toString
    val mfDir = new org.apache.hadoop.fs.Path(s"$base/mf")
    val w = new MapFile.Writer(conf, mfDir,
      MapFile.Writer.keyClass(classOf[Text]),
      MapFile.Writer.valueClass(classOf[Text]))
    kvs.foreach { case (k, v) => w.append(new Text(k), new Text(v)) }
    w.close()
    val got = LegacyContainers.readMapFile(spark, mfDir.toString)
      .as[(String, String)].collect().sorted.toSeq
    assert(got == kvs)
    // BloomMapFile: identical layout + a bloom sidecar the scan ignores
    val bfDir = new org.apache.hadoop.fs.Path(s"$base/bf")
    val bw = new BloomMapFile.Writer(conf, bfDir,
      MapFile.Writer.keyClass(classOf[Text]),
      MapFile.Writer.valueClass(classOf[Text]))
    kvs.foreach { case (k, v) => bw.append(new Text(k), new Text(v)) }
    bw.close()
    val gotBloom = LegacyContainers.readMapFile(spark, bfDir.toString)
      .as[(String, String)].collect().sorted.toSeq
    assert(gotBloom == kvs)
  }

  test("readTFile scans multiple TFiles as parallel whole-file tasks") {
    import org.apache.hadoop.io.file.tfile.TFile
    val base = java.nio.file.Files.createTempDirectory("graft-tfile").toString
    val dir = new org.apache.hadoop.fs.Path(base)
    val fs = dir.getFileSystem(conf)
    kvs.grouped(25).zipWithIndex.foreach { case (part, i) =>
      val os = fs.create(new org.apache.hadoop.fs.Path(dir, s"part-$i.tfile"))
      val tw = new TFile.Writer(os, 64 * 1024, TFile.COMPRESSION_NONE,
        TFile.COMPARATOR_MEMCMP, conf)
      part.foreach { case (k, v) =>
        tw.append(k.getBytes("UTF-8"), v.getBytes("UTF-8"))
      }
      tw.close(); os.close()
    }
    val got = LegacyContainers.readTFile(spark, s"$base/part-*.tfile")
      .as[(String, String)].collect().sorted.toSeq
    assert(got == kvs)
    // non-matching literal path: globStatus yields null, reader yields empty
    assert(LegacyContainers.readTFile(spark, s"$base/absent.tfile").isEmpty)
  }
}

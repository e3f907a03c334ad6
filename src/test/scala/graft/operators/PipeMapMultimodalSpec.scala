package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class PipeMapMultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("pipeMap through /bin/cat is an identity on framed lines") {
    val df = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    val out = PipeOps.pipeMap(df, Seq("/bin/cat")).as[String].collect().toSet
    assert(out == Set("a\t1", "b\t2"))
  }

  test("pipeReduce delivers each key's rows contiguously to the command") {
    // awk prints key<TAB>count-per-contiguous-run; if rows of one key were
    // split across runs the per-key counts would not sum to one line per key
    val df = (1 to 50).map(i => (i % 5, i)).toDF("k", "v")
    val out = PipeOps.pipeReduce(df, Seq("k"),
      Seq("/bin/sh", "-c",
        """awk -F'\t' 'BEGIN { prev = "\x01none" } { if ($1 != prev) { if (NR > 1) print prev "\t" c; prev = $1; c = 0 } c++ } END { if (NR > 0) print prev "\t" c }'"""))
    val parsed = PipeOps.parseKv(out)
      .as[(String, String)].collect().map { case (k, c) => (k.toInt, c.toInt) }
    // each key appears exactly once across all partition runs => contiguous
    assert(parsed.groupBy(_._1).forall(_._2.length == 1))
    assert(parsed.map(_._2).sum == 50)
  }

  test("pipeMapBinary round-trips bytes containing tabs, newlines, and NULs") {
    // raw line framing would split these payloads mid-record; the base64
    // framing must deliver them back bit-for-bit
    val hostile = Seq(
      (1L, "plain".getBytes("UTF-8")),
      (2L, "tab\there\nand newline".getBytes("UTF-8")),
      (3L, Array[Byte](0, 1, 2, 9, 10, 13, -1, -128))
    ).toDF("id", "payload")
    val out = PipeOps.pipeMapBinary(hostile, Seq("/bin/cat"))
    val back = PipeOps.parseBinary(out, Seq("id", "payload"))
      .select(col("id").cast("string").cast("long"), col("payload"))
      .as[(Long, Array[Byte])].collect().toMap
    assert(back(1L).toSeq == "plain".getBytes("UTF-8").toSeq)
    assert(back(2L).toSeq == "tab\there\nand newline".getBytes("UTF-8").toSeq)
    assert(back(3L).toSeq == Seq[Byte](0, 1, 2, 9, 10, 13, -1, -128))
  }

  test("parseKv splits on the first separator only") {
    val lines = Seq("k1\tv\twith\ttabs", "k2\t", "k3").toDF("line")
    val got = PipeOps.parseKv(lines).as[(String, String)].collect().toSet
    assert(got == Set(("k1", "v\twith\ttabs"), ("k2", ""), ("k3", "")))
  }

  test("grep counts regex matches and sorts desc") {
    val df = Seq("spark scan scan", "scan spark").toDF("text")
    val got = MapOps.grep(df, "text", "sc[a-z]+").as[(String, Long)].collect().toSeq
    assert(got == Seq(("scan", 3L)))
  }

  test("multimodal stub featurizer is deterministic and batched") {
    val df = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")
    val payloads = MultimodalOps.withBinaryPayload(df, "text")
    val feats = MultimodalOps.extractFeatures(payloads, "doc_id", "payload")
      .collect().sortBy(_.id)
    assert(feats.length == 2)
    assert(feats(0).n_bytes == 11L && feats(1).n_bytes == 0L)
    assert(feats(0).feature.length == 8)
    assert(feats(1).feature.forall(_ == 0f))
    // deterministic: same input -> same feature
    val again = MultimodalOps.extractFeatures(payloads, "doc_id", "payload")
      .collect().sortBy(_.id)
    assert(feats.map(_.feature.toSeq).toSeq == again.map(_.feature.toSeq).toSeq)
  }

  test("resize stub produces fixed-shape payloads; frame sampler fans out") {
    val df = Seq((1L, "hello world document payload"), (2L, "")).toDF("doc_id", "text")
    val payloads = MultimodalOps.withBinaryPayload(df, "text")
    val resized = MultimodalOps.resizeStub(payloads, "doc_id", "payload", 4, 4)
      .collect().sortBy(_._1)
    assert(resized.forall(_._2.length == 16))
    val frames = MultimodalOps.frameSampleStub(payloads, "doc_id", "payload", 3)
    assert(frames.count() == 6) // 2 docs x 3 frames
    assert(frames.filter(col("doc_id") === 1 && col("frame") === 0).count() == 1)
  }

  test("resizeImage really decodes/scales/encodes PNG; falls back to stub") {
    // 4x4 gray PNG with pixel(i) = i*16 -> nearest-neighbor 2x2 keeps
    // pixels at (0,0),(2,0),(0,2),(2,2) = 0, 32, 128, 160
    val pixels = Array.tabulate[Byte](16)(i => (i * 16).toByte)
    val png = MultimodalOps.encodePngGray(pixels, 4, 4)
    assert(MultimodalOps.decodePngGray(png).toSeq == pixels.toSeq) // lossless
    val df = Seq((1L, png), (2L, "not a png".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val out = MultimodalOps.resizeImage(df, "doc_id", "payload", 2, 2)
      .collect().sortBy(_._1).toMap
    assert(MultimodalOps.decodePngGray(out(1L)).toSeq ==
      Seq[Byte](0, 32, 128.toByte, 160.toByte))
    // non-PNG payload takes the deterministic stub fold (w*h raw bytes)
    assert(out(2L).toSeq == "not ".getBytes("UTF-8").toSeq)
  }

  test("WAV PCM16 encode/decode round-trips; stripe means aggregate samples") {
    val samples = Array[Short](100, -200, 300, -400, 500, -600, 700, -800)
    val wav = MultimodalOps.encodeWavPcm16(samples, sampleRate = 8000)
    // container sniffs as wav via the published magic bytes
    val sniffed = Seq((1L, wav)).toDF("id", "payload")
      .select(MultimodalOps.sniffFormat(col("payload")).as("fmt")).head.getString(0)
    assert(sniffed == "wav")
    assert(MultimodalOps.decodeWavPcm16(wav).toSeq == samples.toSeq)
    // unknown chunk between fmt and data must be skipped (real-world WAVs
    // carry LIST/fact chunks): splice one in and decode again
    val (head, tail) = wav.splitAt(36) // 36 = end of fmt chunk
    val junk = "LIST".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 1, 2, 3, 0)
    assert(MultimodalOps.decodeWavPcm16(head ++ junk ++ tail).toSeq == samples.toSeq)
    // distributed stripe means: 2 stripes over 8 samples, folded in-kernel
    val df = Seq((7L, wav)).toDF("doc_id", "payload")
    val meansDf = MultimodalOps.audioStripeMeans(df, "doc_id", "payload", 2)
    assert(!meansDf.queryExecution.executedPlan.toString.contains("Exchange"),
      "stripe stats must fold inside the decode kernel, not via a shuffle")
    val means = meansDf.collect().map(r => (r.getInt(1), r.getDouble(2))).toMap
    assert(means(0) == (100 + 300 + 500 + 700) / 4.0)
    assert(means(1) == (-200 - 400 - 600 - 800) / 4.0)
  }

  test("imageHistogram bins decoded PNG intensities densely, in-kernel") {
    // 2x2 image: intensities 0, 15, 16, 255 -> bins 0, 0, 1, 15 (16 bins)
    val png = MultimodalOps.encodePngGray(
      Array[Byte](0, 15, 16, 255.toByte), 2, 2)
    val df = Seq((9L, png)).toDF("doc_id", "payload")
    val histDf = MultimodalOps.imageHistogram(df, "doc_id", "payload", bins = 16)
    assert(!histDf.queryExecution.executedPlan.toString.contains("Exchange"),
      "histogram must fold inside the decode kernel, not via a shuffle")
    val hist = histDf.collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(hist.size === 16, "every bin must be present (dense vector)")
    assert(hist(0) === 2L && hist(1) === 1L && hist(15) === 1L)
    assert((2 to 14).forall(hist(_) == 0L))
  }

  test("resizeImage routes JPEG through the real codec within tolerance") {
    val pixels = Array.tabulate[Byte](256)(i => (32 + (i * 7) % 95).toByte)
    val jpeg = MultimodalOps.encodeJpegGray(pixels, 16, 16)
    assert((jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8) // JPEG magic
    val sniffed = Seq((1L, jpeg)).toDF("id", "payload")
      .select(MultimodalOps.sniffFormat(col("payload")).as("fmt")).head.getString(0)
    assert(sniffed == "jpeg")
    val out = MultimodalOps.resizeImage(
      Seq((1L, jpeg)).toDF("doc_id", "payload"), "doc_id", "payload", 8, 8)
      .collect().head._2
    val got = MultimodalOps.decodePngGray(out)
    val errs = (0 until 64).map { i =>
      val exp = pixels((2 * (i / 8)) * 16 + 2 * (i % 8)) & 0xff
      math.abs((got(i) & 0xff) - exp)
    }
    assert(errs.max <= 16 && errs.sum / 64.0 <= 4.0,
      s"JPEG round-trip drifted: max=${errs.max} mean=${errs.sum / 64.0}")
  }

  test("frameSampleGif decodes real animated GIFs at exact stride") {
    val frames = (0 until 4).map(f => Array.tabulate[Byte](16)(i => (f * 16 + i).toByte))
    val gif = MultimodalOps.encodeGifFrames(frames, 4, 4)
    assert(gif.take(4).map(_.toChar).mkString == "GIF8")
    val df = Seq((5L, gif)).toDF("doc_id", "payload")
    // n=2 over 4 frames -> source frames 0 and 2, pixels bit-exact
    val out = MultimodalOps.frameSampleGif(df, "doc_id", "payload", 2)
      .collect().map(r => r.getInt(1) -> r.getAs[Array[Byte]](2)).toMap
    assert(out(0).toSeq == frames(0).toSeq)
    assert(out(1).toSeq == frames(2).toSeq)
    // non-GIF payload falls back to the byte-slice stub
    val stub = MultimodalOps.frameSampleGif(
      Seq((6L, "abcdef".getBytes("UTF-8"))).toDF("doc_id", "payload"),
      "doc_id", "payload", 2)
      .collect().map(r => r.getInt(1) -> r.getAs[Array[Byte]](2)).toMap
    assert(new String(stub(0), "UTF-8") == "abc")
  }

  test("keyframesAvi: real RIFF index walk, only flagged frames decode") {
    // 6 smooth-gradient frames (JPEG-friendly), keyframes at 0/2/4
    val frames = (0 until 6).map(f =>
      Array.tabulate[Byte](64)(i => (f * 30 + i * 2).toByte))
    val avi = MultimodalOps.encodeAviMjpeg(frames, 8, 8, f => f % 2 == 0)
    assert(avi.take(4).map(_.toChar).mkString == "RIFF" &&
      new String(avi, 8, 4, "US-ASCII") == "AVI ")
    val df = Seq((9L, avi)).toDF("doc_id", "payload")
    val out = MultimodalOps.keyframesAvi(df, "doc_id", "payload")
      .collect().map(r => r.getInt(1) -> r.getAs[Array[Byte]](2)).toMap
    assert(out.keySet == Set(0, 2, 4),
      s"only AVIIF_KEYFRAME entries must surface: ${out.keySet}")
    out.foreach { case (f, px) =>
      assert(px.length == 64)
      val errs = (0 until 64).map(i =>
        math.abs((px(i) & 0xff) - (frames(f)(i) & 0xff)))
      assert(errs.max <= 24 && errs.sum / 64.0 <= 6.0,
        s"frame $f JPEG drift: max=${errs.max} mean=${errs.sum / 64.0}")
    }
    // non-AVI payload keeps the deterministic stub shape
    val stub = MultimodalOps.keyframesAvi(
      Seq((7L, "abcdef".getBytes("UTF-8"))).toDF("doc_id", "payload"),
      "doc_id", "payload").collect()
    assert(stub.length == 1 && stub.head.getInt(1) == 0)
  }

  test("binaryMeta computes byte length and md5 over the payload") {
    val df = Seq((1L, "abc")).toDF("doc_id", "text")
    val row = MultimodalOps.binaryMeta(
      MultimodalOps.withBinaryPayload(df, "text"), "payload")
      .select("n_bytes", "content_hash").head()
    assert(row.getLong(0) == 3L)
    assert(row.getString(1) == "900150983cd24fb0d6963f7d28e17f72")
  }

  test("audioFrameFeatures: exact RMS and ZCR per frame, partial tail kept") {
    val spark2 = graft.TestSpark.spark
    import spark2.implicits._
    // 6 samples, frame 4: full frame [3,-3,3,-3] then tail [0,0]
    val wav = Seq((1L, MultimodalOps.encodeWavPcm16(
      Array[Short](3, -3, 3, -3, 0, 0)))).toDF("id", "payload")
    val out = MultimodalOps.audioFrameFeatures(wav, "id", "payload",
        frameSize = 4)
      .orderBy("frame")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // frame 0: rms = 3 exactly, every adjacent pair flips (3/3 = 1e6)
    // frame 1: silence -> rms 0; 0 >= 0 so no flips
    assert(out === Seq((1L, 0L, 4L, 3000000L, 1000000L),
      (1L, 1L, 2L, 0L, 0L)))
  }

  test("frameDiffs: static pair diffs 0, a step change diffs exactly") {
    val spark2 = graft.TestSpark.spark
    import spark2.implicits._
    val flat = Array.fill[Byte](4)(10)
    val bright = Array.fill[Byte](4)(30)
    val gif = Seq((1L, MultimodalOps.encodeGifFrames(
      Seq(flat, flat, bright), 2, 2))).toDF("id", "payload")
    val out = MultimodalOps.frameDiffs(gif, "id", "payload")
      .orderBy("frame_pair")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // pair 1: identical frames; pair 2: |30-10| = 20 everywhere
    assert(out === Seq((1L, 1L, 4L, 0L), (1L, 2L, 4L, 20000000L)))
  }

  test("dHash: ascending rows set every bit, flat rows none") {
    val spark2 = graft.TestSpark.spark
    import spark2.implicits._
    // rows 0-3 ascending (every right neighbor brighter -> bits 255),
    // rows 4-7 constant (strict > never fires -> bits 0)
    val px = Array.tabulate[Byte](72) { i =>
      val (r, c) = (i / 9, i % 9)
      if (r < 4) c.toByte else 42.toByte
    }
    val df = Seq((7L, MultimodalOps.encodePngGray(px, 9, 8)))
      .toDF("id", "payload")
    val out = MultimodalOps.dHash(df, "id", "payload")
      .orderBy("row").as[(Long, Long, Long)].collect()
    assert(out.length === 8)
    assert(out.take(4).forall(_._3 === 255L))
    assert(out.drop(4).forall(_._3 === 0L))
  }
}

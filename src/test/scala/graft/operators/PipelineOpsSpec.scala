package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Round-4 LLM-pipeline operators: chunking, stratified sampling,
  * vocabulary, class weights. */
class PipelineOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("chunkDocuments covers every token; overlap is exact") {
    val doc = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = MapOps.chunkDocuments(doc, col("doc_id"), col("text"),
      size = 5, overlap = 2)
      .orderBy("chunk_id")
      .select("chunk").as[String].collect()
    // stride 3, starts 1,4,7 (start <= 10-2=8): windows [1-5],[4-8],[7-10]
    assert(chunks.toSeq == Seq(
      "w1 w2 w3 w4 w5", "w4 w5 w6 w7 w8", "w7 w8 w9 w10"))
    // consecutive chunks share exactly `overlap` tokens; union covers all
    val tokSets = chunks.toSeq.map(_.split(" ").toSeq)
    tokSets.sliding(2).foreach { pair =>
      assert(pair.head.intersect(pair.last).length == 2)
    }
    assert(tokSets.flatten.distinct.length == 10)
  }

  test("chunkDocuments: short docs yield one whole-doc chunk; empty drop") {
    val docs = Seq((1L, "a b c"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val out = MapOps.chunkDocuments(docs, col("doc_id"), col("text"),
      size = 64, overlap = 16)
      .select("doc_id", "chunk", "n_tokens").as[(Long, String, Long)].collect()
    assert(out.toSeq == Seq((1L, "a b c", 3L)))
  }

  test("chunkDocuments invariants sweep: cover all, dense ids, exact overlap") {
    // doc n carries tokens t1..tn — invariants must hold for every length
    // under several (size, overlap) shapes, including stride-1
    val docs = (1 to 120).map(n =>
      (n.toLong, (1 to n).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    for ((size, overlap) <- Seq((8, 0), (8, 3), (16, 15), (5, 2), (64, 16))) {
      val out = MapOps.chunkDocuments(docs, col("doc_id"), col("text"),
        size, overlap)
        .select("doc_id", "chunk_id", "chunk")
        .as[(Long, Long, String)].collect()
        .groupBy(_._1)
      assert(out.size == 120, s"every doc must chunk (size=$size)")
      out.foreach { case (n, rows) =>
        val chunks = rows.sortBy(_._2).map(_._3.split(" ").toSeq).toSeq
        assert(rows.map(_._2).sorted.toSeq == (1L to rows.length),
          s"ids not dense: doc $n size=$size overlap=$overlap")
        assert(chunks.flatten.distinct.size == n.toInt,
          s"coverage hole: doc $n size=$size overlap=$overlap")
        chunks.sliding(2).filter(_.size == 2).foreach { pair =>
          assert(pair.head.intersect(pair.last).size == overlap,
            s"overlap off: doc $n size=$size overlap=$overlap")
        }
        assert(chunks.forall(_.size <= size))
      }
    }
  }

  test("stratifiedHashSample is deterministic and respects fractions") {
    val rows = (1L to 2000L).map(i =>
      (i, if (i % 2 == 0) "big" else "rare")).toDF("id", "grp")
    val frac = Map("big" -> 0.2, "rare" -> 1.0)
    val take1 = SortOps.stratifiedHashSample(rows, col("id"), col("grp"), frac)
      .select("id").as[Long].collect().toSet
    val take2 = SortOps.stratifiedHashSample(rows, col("id"), col("grp"), frac)
      .select("id").as[Long].collect().toSet
    assert(take1 == take2) // pure function of the key
    val kept = rows.filter(col("id").isin(take1.toSeq: _*))
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(kept("rare") == 1000L) // fraction 1.0 keeps everything
    assert(math.abs(kept("big") - 200L) < 60) // ~20% of 1000, hash jitter
    // unlisted strata drop entirely
    val none = SortOps.stratifiedHashSample(
      rows.withColumn("grp", lit("other")), col("id"), col("grp"), frac)
    assert(none.isEmpty)
  }

  test("buildVocab floors counts and ids are dense by (cnt desc, token)") {
    val docs = Seq("a a a b b c", "a b d", "d").toDF("text")
    val v = MapOps.buildVocab(docs, col("text"), minCount = 2)
      .select("token", "cnt", "token_id").as[(String, Long, Long)].collect()
      .sortBy(_._3)
    assert(v.toSeq == Seq(("a", 4L, 1L), ("b", 3L, 2L), ("d", 2L, 3L)))
  }

  test("sniffFormat: magics route, short/ambiguous payloads stay unknown") {
    val rows = Seq(
      (1L, Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 13, 10, 26, 10)), // png
      (2L, Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE1.toByte, 0, 1)), // jpeg (any 4th byte)
      (3L, "RIFF1234WAVEfmt ".getBytes("UTF-8")), // wav
      (4L, "RIFF1234AVI LIST".getBytes("UTF-8")), // riff AVI subtype (r15)
      (5L, Array[Byte](0x89.toByte, 0x50)), // truncated magic
      (6L, Array.empty[Byte]),
      (7L, "%PDF-1.7".getBytes("UTF-8")),
      (8L, Array[Byte](0, 0, 0, 32) ++ "ftypisom".getBytes("UTF-8")), // mp4
      (9L, "RIFF1234WEBPVP8 ".getBytes("UTF-8")), // webp
      (10L, Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte)), // webm/EBML
      (11L, "RIFF1234MIDI".getBytes("UTF-8")) // riff, unknown subtype
    ).toDF("id", "payload")
    val got = rows.select(col("id"),
      MultimodalOps.sniffFormat(col("payload")).as("f"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "png", 2L -> "jpeg", 3L -> "wav",
      4L -> "avi", 5L -> "unknown", 6L -> "unknown", 7L -> "pdf",
      8L -> "mp4", 9L -> "webp", 10L -> "webm", 11L -> "unknown"))
  }

  test("incrementalExactDedup: seen dropped, in-batch dupes first-wins") {
    val seen = Seq("old doc").toDF("text")
      .select(md5(col("text")).as("content_hash"))
    val incoming = Seq(
      (10L, "old doc"),   // already seen -> drop
      (11L, "fresh a"),   // keep
      (12L, "fresh a"),   // in-batch dupe of 11 -> drop
      (13L, "fresh b")    // keep
    ).toDF("doc_id", "text")
    val kept = DedupOps.incrementalExactDedup(
      incoming, col("doc_id"), col("text"), seen)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(11L, 13L))
    // an all-seen batch survives as empty, not an error
    val none = DedupOps.incrementalExactDedup(
      Seq((20L, "old doc")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), seen)
    assert(none.isEmpty)
  }

  test("equiDepthHistogram: ~equal buckets on uniform data, ties go left") {
    val uniform = (1 to 800).map(_.toDouble).toDF("v")
    val h = AggOps.equiDepthHistogram(uniform, "v", 8)
      .select("bucket", "cnt").as[(Long, Long)].collect().toMap
    assert(h.keySet == (0L to 7L).toSet)
    assert(h.values.forall(c => math.abs(c - 100L) <= 1))
    // heavy ties: all duplicates of one value land in ONE bucket (left)
    val ties = (Seq.fill(500)(5.0) ++ Seq(1.0, 9.0)).toDF("v")
    val ht = AggOps.equiDepthHistogram(ties, "v", 4)
      .select("bucket", "cnt").as[(Long, Long)].collect().toMap
    assert(ht.values.max >= 500L)
  }

  test("classWeights: w = N / (K * n_c), rare class upweighted") {
    val df = (Seq.fill(8)("common") ++ Seq.fill(2)("rare")).toDF("label")
    // N=10, K=2: common 10/(2*8)=0.625, rare 10/(2*2)=2.5
    val got = AggOps.classWeights(df, col("label"))
      .select("label", "n", "weight").as[(String, Long, Double)]
      .collect().map { case (l, n, wt) => l -> ((n, wt)) }.toMap
    assert(got("common") == ((8L, 0.625)))
    assert(got("rare") == ((2L, 2.5)))
  }
}

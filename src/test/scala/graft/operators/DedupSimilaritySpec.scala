package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class DedupSimilaritySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again today"),
    (2L, "the quick brown fox jumps over the lazy dog again tomorrow"), // near-dup of 1
    (3L, "completely different words about spark engines and shuffles here"),
    (4L, "the quick brown fox jumps over the lazy dog again today") // exact dup of 1
  ).toDF("doc_id", "text")

  test("exactDedup groups identical text, keeps min id") {
    val out = DedupOps.exactDedup(docs, col("doc_id"), col("text"))
    assert(out.count() == 3)
    val dup = out.filter(col("n_copies") === 2).head()
    assert(dup.getLong(1) == 1L) // keep_id
  }

  test("nearDupClusters collapses transitive chains into min-labeled components") {
    // chain 1-2-3 plus isolated pair 7-9: labels propagate across hops
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("a", "b")
    val out = DedupOps.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("shingle signature hash families match the portable md5-window SQL semantics") {
    // The oracle-compat invariant: family i<=8 = 16-hex window at offset
    // 2*i of md5(shingle); family i>=9 = same windows over md5("b|"+shingle)
    // for block b=i/9. A Spark-side regression here silently breaks every
    // minhash oracle, so pin it against an independent reference evaluation.
    val rnd = new scala.util.Random(7)
    val texts = (1L to 20L).map(id =>
      (id, Seq.fill(12)(rnd.alphanumeric.take(4).mkString).mkString(" ")))
    val df = texts.toDF("doc_id", "text")
    val numHashes = 21 // 3 digest blocks
    val out = DedupOps.shingleSignatures(df, col("doc_id"), col("text"), 3, numHashes)
      .select("doc_id", "shingles", "sig")
      .as[(Long, Seq[String], Seq[String])].collect()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    out.foreach { case (_, shingles, sig) =>
      assert(sig.length == numHashes)
      (0 until numHashes).foreach { i =>
        val expected = shingles.map { sh =>
          val block = if (i / 9 == 0) sh else s"${i / 9}|$sh"
          md5hex(block).substring(2 * (i % 9), 2 * (i % 9) + 16)
        }.min
        assert(sig(i) == expected, s"family $i")
      }
    }
  }

  test("minhashLsh finds planted near-dup and exact-dup pairs") {
    val out = DedupOps.minhashLsh(docs, col("doc_id"), col("text"),
      shingleSize = 5, bands = 4, rowsPerBand = 2, minJaccard = 0.5)
    val pairs = out.select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // exact dup: jaccard 1.0
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated doc
  }

  test("incrementalMinhashLsh equals from-scratch LSH restricted to batch pairs") {
    // a wider corpus: three near-dup families + noise, batch = ids % 3 == 0
    val rnd = new scala.util.Random(11)
    val base = (0 until 6).map(_ =>
      Seq.fill(14)(rnd.alphanumeric.take(4).mkString).mkString(" "))
    val wide = (0L until 30L).map { id =>
      val fam = (id % 6).toInt
      // family members share the template; half get one token swapped
      val t = if (id < 12 || id % 2 == 0) base(fam)
              else base(fam).replaceFirst("\\w+$", "zzz")
      (id, t)
    }.toDF("doc_id", "text")
    val batch = wide.filter(col("doc_id") % 3 === 0)
    val seen = wide.filter(col("doc_id") % 3 =!= 0)
    val seenSigs = DedupOps.minhashSignatures(seen, col("doc_id"), col("text"),
      shingleSize = 5, bands = 4, rowsPerBand = 2)
    val inc = DedupOps.incrementalMinhashLsh(batch, col("doc_id"), col("text"),
        seenSigs, shingleSize = 5, bands = 4, rowsPerBand = 2,
        minJaccard = 0.3)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val full = DedupOps.minhashLsh(wide, col("doc_id"), col("text"),
        shingleSize = 5, bands = 4, rowsPerBand = 2, minJaccard = 0.3)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect()
      .filter(p => p._1 % 3 == 0 || p._2 % 3 == 0).toSet
    assert(inc === full,
      "incremental output must equal the from-scratch LSH restricted to " +
        "pairs touching a batch doc")
    assert(inc.nonEmpty, "the planted families must produce batch pairs")
    // and no seen-seen pair leaks in
    assert(inc.forall(p => p._1 % 3 == 0 || p._2 % 3 == 0))
  }

  test("incrementalMinhashLsh plans equi-joins only — no cartesian anywhere") {
    // the 100 TB contract: batch-vs-seen candidates come from an
    // equi-join on the band key and verification from doc-id hash joins;
    // a nested-loop/cartesian anywhere means the plan degenerated
    val seenSigs = DedupOps.minhashSignatures(
      docs.filter(col("doc_id") =!= 2L), col("doc_id"), col("text"),
      shingleSize = 5, bands = 4, rowsPerBand = 2)
    val out = DedupOps.incrementalMinhashLsh(
      docs.filter(col("doc_id") === 2L), col("doc_id"), col("text"),
      seenSigs, shingleSize = 5, bands = 4, rowsPerBand = 2,
      minJaccard = 0.3)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"incremental LSH must never plan a product join:\n$plan")
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((1L, 2L), (2L, 4L)), "near-dups of doc 2 found")
  }

  test("incrementalClusters folds new pairs in, merging bridged old clusters") {
    // existing: cluster {1,2,3} labeled 1 and {7,9} labeled 7; the batch
    // bridges 3-7 (the two old clusters must merge to min label 1) and
    // introduces a brand-new pair 20-21
    val existing = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (9L, 7L))
      .toDF("doc_id", "cluster_id")
    val newPairs = Seq((3L, 7L), (20L, 21L)).toDF("a", "b")
    val out = DedupOps.incrementalClusters(existing, newPairs)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L, 9L -> 1L,
      20L -> 20L, 21L -> 20L))
  }

  test("minhashLsh hot bucket aggregates ids only, never shingle payloads") {
    // 60 identical docs: every band key is shared by all 60, so each band
    // forms one bucket right at the configured cap — the OOM shape the
    // id-only aggregation exists for
    val hot = (1L to 60L)
      .map(i => (i, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val out = DedupOps.minhashLsh(hot, col("doc_id"), col("text"),
      shingleSize = 3, bands = 4, rowsPerBand = 2, minJaccard = 0.9,
      maxBucket = 60)
    assert(out.count() == 60L * 59 / 2)
    assert(out.select("jaccard").distinct().as[Double].collect().toSeq
      == Seq(1.0))
    // the scale guard itself: the bucket aggregate must collect doc ids
    // (~8 B each), never the shingle arrays (hundreds of MB in a hot
    // bucket) — shingles come back through the verify joins instead
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("collect_list(doc_id"), plan)
    assert(!plan.contains("collect_list(struct"), plan)
    // buckets past the cap drop entirely (quadratic-straggler guard)
    val capped = DedupOps.minhashLsh(hot, col("doc_id"), col("text"),
      shingleSize = 3, bands = 4, rowsPerBand = 2, minJaccard = 0.9,
      maxBucket = 59)
    assert(capped.count() == 0)
  }

  test("typed simhash equals the expression-form simhash") {
    val typed = DedupOps.simhash64Typed(docs, col("doc_id"), col("text"))
    val expr = docs.select(col("doc_id"),
      DedupOps.simhash64(col("text")).as("simhash"))
    assert(typed.except(expr).isEmpty && expr.except(typed).isEmpty)
  }

  test("simhash of near-identical docs differs in few bits") {
    val m = DedupOps.simhash64Typed(docs, col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(m(1L) == m(4L))
    assert(hamming(m(1L), m(2L)) < hamming(m(1L), m(3L)))
  }

  test("nearDupClustersStar labels a 200-node chain in O(log n) rounds") {
    // a pure chain is the worst case for per-hop label propagation
    // (O(diameter) rounds); the star algorithm must still produce
    // min-labeled components — and quickly
    val chain = (2L to 200L).map(i => (i - 1, i)).toDF("a", "b")
    val labels = DedupOps.nearDupClustersStar(chain)
      .as[(Long, Long)].collect().toMap
    assert(labels.size == 200)
    assert(labels.values.forall(_ == 1L))
    // two disjoint components + an isolated pair keep separate labels
    val multi = Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L))
      .toDF("a", "b")
    val got = DedupOps.nearDupClustersStar(multi)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
    // cross-check: identical labeling to the propagation variant
    val a = DedupOps.nearDupClusters(multi).as[(Long, Long)].collect().toSet
    assert(a == got.toSeq.map(identity).toSet)
  }

  test("simhashNearDupPairs caps hot buckets instead of going quadratic") {
    // 1k identical short docs: every band key collides into ONE bucket, the
    // degenerate corpus that would make an uncapped band join emit ~500k
    // pairs. With the cap the hot bucket is dropped and the job stays tiny.
    val degenerate = (1L to 1000L).toDF("doc_id")
      .withColumn("text", lit("spam spam spam"))
    val capped = DedupOps.simhashNearDupPairs(
      degenerate, col("doc_id"), col("text"),
      maxHamming = 3, bands = 4, maxBucket = 100)
    assert(capped.isEmpty)
    // and the cap leaves ordinary (sub-cap) buckets alone: planted dup pair
    // (1,4) from the shared fixture still surfaces with the same cap
    val normal = DedupOps.simhashNearDupPairs(
      docs, col("doc_id"), col("text"),
      maxHamming = 3, bands = 4, maxBucket = 100)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(normal.contains((1L, 4L)))
  }

  test("ngramJaccardPairs verifies with exact jaccard") {
    val out = DedupOps.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      shingleSize = 3, maxBucket = 50, minJaccard = 0.3)
      .as[(Long, Long, Double)].collect()
    val exact = out.find(r => r._1 == 1L && r._2 == 4L)
    assert(exact.exists(_._3 == 1.0))
  }

  test("cosineTopK ranks by cosine similarity with id tiebreak") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0.9f, 0.1f, 0f)), // closest to 0
      (2L, Array(0f, 1f, 0f)),
      (3L, Array(0.5f, 0.5f, 0f))
    ).toDF("vec_id", "embedding")
    val out = SimilarityOps.cosineTopK(vecs, vecs.filter(col("vec_id") === 0), 2)
      .select("nbr_id", "rank").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 1, 3L -> 2))
  }

  test("ivfTopKFromIndex: an append-grown index answers like the from-scratch search") {
    val n = 60
    val vecs = (0 until n).map { i =>
      val arr = Array.tabulate(8)(d => math.cos(i * 13 + d * 5).toFloat)
      (i.toLong, arr)
    }.toDF("vec_id", "embedding")
    val seen = vecs.filter(col("vec_id") % 4 =!= 0)
    val batch = vecs.filter(col("vec_id") % 4 === 0)
    val cent = seen.orderBy("vec_id").limit(6)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    // incremental: seen assigned once, the batch assigned alone, unioned
    val grown = SimilarityOps.assignToNearest(seen, cent)
      .unionByName(SimilarityOps.assignToNearest(batch, cent))
    val queries = vecs.filter(col("vec_id") < 5)
    val inc = SimilarityOps
      .ivfTopKFromIndex(grown, cent, queries, k = 3, nprobe = 2)
      .select("query_id", "nbr_id", "rank").as[(Long, Long, Long)]
      .collect().toSet
    // from-scratch: the whole union assigned in one pass, same centroids
    val full = SimilarityOps
      .ivfTopKFromIndex(SimilarityOps.assignToNearest(vecs, cent), cent,
        queries, k = 3, nprobe = 2)
      .select("query_id", "nbr_id", "rank").as[(Long, Long, Long)]
      .collect().toSet
    assert(inc === full,
      "per-vector assignment against frozen centroids must make append " +
        "and rebuild indistinguishable")
    assert(inc.nonEmpty)
  }

  test("lshCosineTopK returns bucket-mates ranked like the exact search") {
    val n = 50
    val vecs = (0 until n).map { i =>
      val arr = Array.tabulate(8)(d => math.sin(i * 31 + d * 7).toFloat)
      (i.toLong, arr)
    }.toDF("vec_id", "embedding")
    val out = SimilarityOps.lshCosineTopK(vecs, vecs.limit(5), k = 3, dims = 8,
      planes = 2)
    // recall is approximate by design; assert shape + determinism only
    val rows = out.select("query_id", "rank").as[(Long, Int)].collect()
    assert(rows.nonEmpty && rows.forall(_._2 <= 3))
  }

  test("gramian folds Σ v·vᵀ exactly; power iteration finds the top PC") {
    // three vectors dominated by axis 1: top PC must align with e1
    val vecs = Seq(
      (1L, Array(10.0f, 1.0f, 0.0f)),
      (2L, Array(9.0f, -1.0f, 0.5f)),
      (3L, Array(11.0f, 0.5f, -0.5f))).toDF("vec_id", "embedding")
    val g = SimilarityOps.gramian(vecs)
      .as[(Long, Long, Double)].collect()
      .map { case (i, j, v) => (i.toInt, j.toInt) -> v }.toMap
    assert(g((1, 1)) == 10.0 * 10 + 9.0 * 9 + 11.0 * 11) // exact: integers
    assert(g((1, 2)) == 10.0 * 1 - 9.0 * 1 + 11.0 * 0.5)
    assert(g.size == 6) // upper triangle of d=3
    val pc = SimilarityOps.topPrincipalComponent(g, d = 3)
    assert(math.abs(pc(0)) > 0.99, s"top PC should align with axis 1: ${pc.toSeq}")
    // projection is a zero-exchange per-row map
    val proj = SimilarityOps.projectOnto(vecs, pc)
    assert(!proj.queryExecution.executedPlan.toString.contains("Exchange"))
    val scores = proj.as[(Long, Double)].collect().toMap
    assert(math.abs(math.abs(scores(3L)) - scores.values.map(math.abs).max) < 1e-9,
      "the longest axis-1 vector projects farthest")
  }

  test("repeatedSpans flags cross-document k-grams, not within-doc repeats") {
    val docs = Seq(
      (1L, "a b c d e"),          // "a b c" shared with doc 2
      (2L, "x a b c y"),
      (3L, "p q r"),              // unique single span
      (4L, "u v"),                // too short for k=3: excluded
      (5L, "m n o m n o m n")     // repeats itself, but in ONE doc only
    ).toDF("doc_id", "text")
    val out = DedupOps.repeatedSpans(docs, col("doc_id"), col("text"), k = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 3L, 1L, 2L, 333333L),
      (2L, 3L, 1L, 2L, 333333L),
      (3L, 1L, 0L, 0L, 0L),
      (5L, 6L, 0L, 0L, 0L)))
  }

  test("removeRepeatedSpans excises exactly the cross-doc covered tokens") {
    val docs = Seq(
      (1L, "a b c d e"),          // "a b c" shared with doc 2 -> a,b,c cut
      (2L, "x a b c y"),          // the same span mid-doc -> a,b,c cut
      (3L, "p q r"),              // unique span: untouched
      (4L, "u v"),                // too short for k=3: byte-identical
      (5L, "m n o m n o m n")     // repeats only within ONE doc: untouched
    ).toDF("doc_id", "text")
    val out = DedupOps.removeRepeatedSpans(docs, col("doc_id"), col("text"),
        k = 3, minDocs = 2)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, "d e", 5L, 2L),
      (2L, "x y", 5L, 2L),
      (3L, "p q r", 3L, 3L),
      (4L, "u v", 2L, 2L),
      (5L, "m n o m n o m n", 8L, 8L)))
  }

  test("removeRepeatedSpans: overlapping duplicated windows merge their coverage") {
    // "a b c d" appears in both docs as 2 overlapping 3-grams (a b c /
    // b c d) -> tokens a..d all covered, the rest survives
    val docs = Seq(
      (1L, "s a b c d t"),
      (2L, "a b c d z w q")
    ).toDF("doc_id", "text")
    val out = DedupOps.removeRepeatedSpans(docs, col("doc_id"), col("text"),
        k = 3, minDocs = 2)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, "s t", 6L, 2L),
      (2L, "z w q", 7L, 3L)))
  }

  test("crossDedupPairs finds only cross-corpus duplicates") {
    val spark2 = graft.TestSpark.spark
    import spark2.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val a = Seq((1L, base), (2L, "one two three four five six seven"))
      .toDF("id", "tx")
    val b = Seq((10L, base),                      // duplicate of a:1
      (11L, "cold dark matter halo spin bias x")) // unrelated
      .toDF("id", "tx")
    val out = DedupOps.crossDedupPairs(a, col("id"), col("tx"),
        b, col("id"), col("tx"), minJaccard = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out === Seq((1L, 10L, 1.0)))
  }

  test("classSeparation: orthogonal classes cohere at 1, confuse at 0") {
    val spark2 = graft.TestSpark.spark
    import spark2.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 1), (4L, Array(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.classSeparation(emb)
      .as[(Int, Long, Long, Int, Long)].collect().toSeq.sortBy(_._1)
    assert(out === Seq((0, 2L, 1000000L, 1, 0L), (1, 2L, 1000000L, 0, 0L)))
  }

  test("classSeparation: the nearer of two other centroids wins") {
    val spark2 = graft.TestSpark.spark
    import spark2.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 1),
      (3L, Array(0.7071f, 0.7071f), 2) // 45 deg: closest to both 0 and 1
    ).toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.classSeparation(emb)
      .select("label", "nearest_label")
      .as[(Int, Int)].collect().toMap
    assert(out(0) === 2 && out(1) === 2)
    assert(out(2) === 0) // ties at cos 45 deg -> smaller label
  }

  test("CC loops leave only their result checkpoint pinned") {
    // the graph-family storage-residual contract, applied to the
    // connected-components rounds: superseded label/edge state and the
    // shared inputs must be released explicitly, not left to GC
    def sweep(): Unit = spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    import spark.implicits._
    val chain = (1L until 60L).map(i => (i, i + 1)).toDF("a", "b")
    sweep()
    val labels = DedupOps.nearDupClusters(chain)
    assert(labels.count() === 60)
    assert(spark.sparkContext.getPersistentRDDs.size === 1,
      s"nearDupClusters residual: ${spark.sparkContext.getPersistentRDDs.size}")
    sweep()
    val star = DedupOps.nearDupClustersStar(chain)
    assert(star.count() === 60)
    assert(spark.sparkContext.getPersistentRDDs.size === 1,
      s"nearDupClustersStar residual: ${spark.sparkContext.getPersistentRDDs.size}")
  }

  test("contentDefinedChunks: chunks partition the token stream exactly") {
    val d = Seq((1L, "a b c d e f g h i j k l m n o p q r s t"),
      (2L, "   "), (3L, "solo")).toDF("id", "text")
    val out = DedupOps.contentDefinedChunks(d, col("id"), col("text"),
      window = 3, modulus = 4).collect()
    // whitespace-only docs vanish; a one-token doc is one chunk
    assert(!out.exists(_.getLong(0) == 2L))
    assert(out.filter(_.getLong(0) == 3L).map(r =>
      (r.getLong(1), r.getString(2), r.getLong(3))).toSeq ===
      Seq((1L, "solo", 1L)))
    // chunks of doc 1, in chunk_id order, concatenate back to the doc
    val c1 = out.filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
    assert(c1.map(_.getString(2)).mkString(" ") ===
      "a b c d e f g h i j k l m n o p q r s t")
    assert(c1.map(_.getLong(3)).sum === 20L)
    assert(c1.map(_.getLong(1)).toSeq === (1L to c1.length).toSeq,
      "chunk ids are dense from 1")
  }

  test("contentDefinedChunks is shift-robust: a prefix edit preserves later chunks") {
    val body = (1 to 60).map(i => s"w${i % 13}x${i % 7}").mkString(" ")
    val d = Seq((1L, body), (2L, s"inserted prefix tokens $body"))
      .toDF("id", "text")
    val out = DedupOps.contentDefinedChunks(d, col("id"), col("text"),
      window = 3, modulus = 4).collect()
    def chunksOf(id: Long) = out.filter(_.getLong(0) == id)
      .sortBy(_.getLong(1)).map(_.getString(2)).toSeq
    val (c1, c2) = (chunksOf(1L), chunksOf(2L))
    // every boundary decision is local (window 3), so once the rolling
    // context re-synchronizes past the edit the chunk streams COINCIDE —
    // assert an ordered common suffix of at least 3 chunks (fixed-offset
    // chunking of the same pair would share essentially nothing)
    val suffix = (1 to math.min(c1.length, c2.length))
      .takeWhile(k => c1.takeRight(k) == c2.takeRight(k)).lastOption
    assert(suffix.exists(_ >= 3),
      s"post-edit chunk streams must re-align, common suffix=$suffix " +
        s"c1=$c1 c2=$c2")
  }
}

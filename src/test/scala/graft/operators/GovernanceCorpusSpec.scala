package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Containment pairs, DP mean, generalize-to-k, and top paths against
  * hand computations. */
class GovernanceCorpusSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("containmentPairs flags the subsumed doc where Jaccard stays low") {
    val docs = Seq(
      (1L, "a b c d e f"),                 // shingles: abcde, bcdef
      (2L, "a b c d e f g h"),             // + cdefg, defgh
      (3L, "x y z w v u t s")              // unrelated
    ).toDF("doc_id", "text")
    val out = DedupOps.containmentPairs(docs, col("doc_id"), col("text"),
        shingleSize = 5, maxBucket = 50, minContainment = 0.9)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().toSeq
    // doc1 fully inside doc2: inter=2, |s1|=2, |s2|=4
    assert(out === Seq((1L, 2L, 2L, 2L, 4L, 1.0, 0.5)))
  }

  test("dpMean is seed-deterministic and tracks the clamped mean at high epsilon") {
    val df = Seq(("g", 0.2), ("g", 0.4), ("g", 9.9)).toDF("k", "v")
    def run(seed: String) = QualityOps.dpMean(df, col("k"), col("v"),
        lo = 0.0, hi = 1.0, epsSum = 1e6, epsCount = 1e6, seed = seed)
      .as[(String, Long)].collect().head._2
    val a = run("s1")
    assert(a === run("s1")) // reproducible release
    // 9.9 clamps to 1.0: mean = 1.6/3 = 0.533333; near-zero noise at 1e6
    assert(math.abs(a - 533333L) <= 2L)
  }

  test("generalizeToK climbs the ladder to the finest k-valid level") {
    val df = (0 until 10).map(i => Tuple1(i.toDouble)).toDF("x")
    val coarse = QualityOps.generalizeToK(df, col("x"), Seq(1L, 10L), k = 2L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(coarse === Seq((10L, 0L, 10L))) // width 1 has singleton classes
    val fine = QualityOps.generalizeToK(df, col("x"), Seq(1L, 10L), k = 1L)
      .collect()
    assert(fine.length === 10 && fine.forall(_.getLong(0) == 1L))
  }

  test("generalizeToK falls back to the coarsest level when nothing satisfies k") {
    val df = Seq(Tuple1(1.0), Tuple1(100.0)).toDF("x")
    val out = QualityOps.generalizeToK(df, col("x"), Seq(1L, 10L), k = 5L)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._2)
    // even width 10 has 1-row classes; release coarsest ladder level
    assert(out === Seq((10L, 0L, 1L), (10L, 100L, 1L)))
  }

  test("maxConcurrency: ends release before starts at the same instant") {
    val iv = Seq(("g", 0L, 10L), ("g", 5L, 15L), ("g", 10L, 20L))
      .toDF("grp", "s", "e")
    val out = AnalyticsOps.maxConcurrency(iv, Seq(col("grp")), col("s"),
        col("e"))
      .as[(String, Long, Long)].collect().head
    // [0,10) and [5,15) overlap at 5; at t=10 the first interval's end
    // applies before the third's start, so the peak never reaches 3
    assert(out === (("g", 2L, 5L)))
  }

  test("maxConcurrency drops empty/inverted intervals") {
    val iv = Seq(("g", 3L, 3L), ("g", 9L, 4L), ("g", 1L, 2L))
      .toDF("grp", "s", "e")
    val out = AnalyticsOps.maxConcurrency(iv, Seq(col("grp")), col("s"),
        col("e")).as[(String, Long, Long)].collect().head
    assert(out === (("g", 1L, 1L)))
  }

  test("editDistancePairs finds substitution and deletion neighbors, nothing else") {
    val df = Seq("abc", "abd", "ab", "xyz").toDF("name")
    val out = DedupOps.editDistancePairs(df, col("name"))
      .as[(String, String, Long)].collect().toSet
    assert(out === Set(("abc", "abd", 1L), ("ab", "abc", 1L),
      ("ab", "abd", 1L)))
  }

  test("scd2Build collapses no-op changes and closes intervals at the next change") {
    val log = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), // no-op: same value
      (1L, 30L, 3L, "B"), (1L, 40L, 4L, "A"),
      (2L, 10L, 5L, "X")
    ).toDF("k", "t", "sq", "v")
    val out = QualityOps.scd2Build(log, col("k"), col("t"), col("sq"),
        col("v"))
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
      .sortBy(r => (r._1, r._3))
    assert(out === Seq(
      (1L, "A", 10L, Some(30L), false),
      (1L, "B", 30L, Some(40L), false),
      (1L, "A", 40L, None, true),
      (2L, "X", 10L, None, true)))
  }

  test("scd2Build: null values are versioned null-safely") {
    val log = Seq((1L, 10L, 1L, Some("A")), (1L, 20L, 2L, None),
      (1L, 30L, 3L, None)).toDF("k", "t", "sq", "v")
    val out = QualityOps.scd2Build(log, col("k"), col("t"), col("sq"),
        col("v")).collect()
    assert(out.length === 2) // null->null is a no-op, A->null is a change
  }

  test("benfordAudit extracts first digits exactly and excludes zeros") {
    val df = Seq(1.23, 19.99, 0.0, 0.02, 950.0).map(Tuple1(_)).toDF("x")
    val out = QualityOps.benfordAudit(df, Seq(lit("all").as("g")), col("x"),
        scale = 2)
      .select("digit", "n_obs").as[(Long, Long)].collect().toMap
    // scaled: 123, 1999, (0 dropped), 2, 95000 -> digits 1,1,2,9
    assert(out === Map(1L -> 2L, 2L -> 1L, 9L -> 1L))
  }

  test("perplexity scores the add-alpha bigram NLL, short docs drop out") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = CorpusOps.perplexity(docs, col("doc_id"), col("text"),
        alpha = 0.5)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // V = 3 (a, b, solo); c(a)=2, c(a b)=2: p = 2.5/3.5
    val nll = math.floor(-math.log(2.5 / 3.5) * 1e9 + 0.5).toLong
    assert(out === Seq((1L, 1L, nll), (2L, 1L, nll))) // doc 3 has no bigram
  }

  test("nbTrain/nbScore: argmax recovers the planted label; unseen tokens take the default") {
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog sat on the rug"),
      (3L, "fr", "le chat dort sur le tapis"),
      (4L, "fr", "le chien dort sur le lit"))
      .toDF("doc_id", "lang", "text")
    val model = CorpusOps.nbTrain(docs, col("lang"), col("text"), alpha = 1.0)
    // one meta row per label, carrying prior + unseen-token default
    val meta = model.filter(col("w").isNull)
      .select("label", "prior_e9").as[(String, Long)].collect().toMap
    assert(meta.keySet === Set("en", "fr"))
    val prior = math.floor(math.log(0.5) * 1e9 + 0.5).toLong
    assert(meta.values.toSeq === Seq(prior, prior))
    val scored = CorpusOps.nbScore(docs, col("doc_id"), col("text"), model)
      .select("doc_id", "label").as[(Long, String)].collect().toMap
    assert(scored === Map(1L -> "en", 2L -> "en", 3L -> "fr", 4L -> "fr"),
      "training docs must classify to their own language")
    // a doc of entirely unseen tokens scores via the defaults; the
    // LARGER default (smaller denominator = smaller vocab mass) wins.
    // Both corpora have 12 tokens, so defaults tie and the label
    // tiebreak (lexicographically smaller) must decide: 'en'.
    val novel = Seq((9L, "zzz qqq")).toDF("doc_id", "text")
    val out = CorpusOps.nbScore(novel, col("doc_id"), col("text"), model)
      .select("doc_id", "label").as[(Long, String)].collect().toMap
    assert(out === Map(9L -> "en"))
  }

  test("goldenRecord: each field survives independently, nulls never overwrite") {
    val df = Seq(
      (1L, 1L, 1L, Some("A"), Option.empty[Double]),
      (1L, 2L, 2L, Option.empty[String], Some(5.0)),
      (1L, 3L, 3L, Option.empty[String], Option.empty[Double])
    ).toDF("k", "t", "sq", "typ", "v")
    val out = QualityOps.goldenRecord(df, col("k"), col("t"), col("sq"),
        Seq("typ", "v"))
      .as[(Long, String, Double, Long, Long)].collect().head
    // typ's last non-null is at t=1; v's at t=2; last_ts is t=3
    assert(out === ((1L, "A", 5.0, 3L, 3L)))
  }

  test("fkOrphans counts non-null child keys missing from the parent") {
    val child = Seq(Some(1L), Some(2L), Some(3L), None).toDF("ck")
    val parent = Seq(1L, 2L).toDF("pk")
    val out = QualityOps.fkOrphans(child, col("ck"), parent, col("pk"))
      .as[(Long, Long, Long, Long)].collect().head
    // 3 non-null FKs, one orphan (3): rate = 1/3 = 333333e-6
    assert(out === ((4L, 1L, 1L, 333333L)))
  }

  test("shareOfTotal: cell shares sum to the parent and grand totals") {
    val df = Seq(("p1", "a", 10.0), ("p1", "b", 30.0), ("p2", "c", 60.0))
      .toDF("p", "c", "m")
    val out = AnalyticsOps.shareOfTotal(df, col("p"), col("c"), col("m"))
      .as[(String, String, Double, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._4, r._5)).toMap
    assert(out(("p1", "a")) === ((250000L, 100000L)))
    assert(out(("p1", "b")) === ((750000L, 300000L)))
    assert(out(("p2", "c")) === ((1000000L, 600000L)))
  }

  test("burstiness: periodic gaps score -1, variance lifts it") {
    // subject with perfectly periodic gaps: sd 0 -> B = -1, CV = 0
    val periodic = (0 to 4).map(i => ("g", 1L, i * 100L, i.toLong))
      .toDF("g", "u", "t", "id")
    val outP = AnalyticsOps.burstiness(periodic, col("g"), col("u"),
        col("t"), col("id"))
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(outP === (("g", 4L, 100L, 0L, -1000000L)))
    // bursty: gaps 1,1,1,997 -> B well above -1
    val bursty = Seq(0L, 1L, 2L, 3L, 1000L).zipWithIndex
      .map { case (t, i) => ("g", 1L, t, i.toLong) }
      .toDF("g", "u", "t", "id")
    val outB = AnalyticsOps.burstiness(bursty, col("g"), col("u"),
        col("t"), col("id"))
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(outB._5 > 0L) // sd > mu for this spread
  }

  test("topPaths counts ordered opening sequences with support floor") {
    val ev = Seq(
      (1L, 1L, 10L, "view"), (1L, 2L, 11L, "click"),
      (2L, 1L, 20L, "view"), (2L, 2L, 21L, "click"),
      (3L, 1L, 30L, "click"), (3L, 2L, 31L, "view")
    ).toDF("u", "t", "id", "e")
    val out = AnalyticsOps.topPaths(ev, col("u"), col("t"), col("id"),
        col("e"), steps = 2, minSupport = 2L)
      .as[(String, Long)].collect().toSeq
    assert(out === Seq(("view>click", 2L))) // user 3's path has support 1
  }

  test("topPaths: short histories contribute their prefix path") {
    val ev = Seq((1L, 1L, 10L, "view"), (2L, 1L, 20L, "view"))
      .toDF("u", "t", "id", "e")
    val out = AnalyticsOps.topPaths(ev, col("u"), col("t"), col("id"),
        col("e"), steps = 3, minSupport = 2L)
      .as[(String, Long)].collect().toSeq
    assert(out === Seq(("view", 2L)))
  }

  test("c4LineClean keeps exactly the terminal, wordy, non-js lines") {
    val docs = Seq(
      // 4 good lines -> kept page
      (1L, "one two three.\ntwo words.\nfour five six?\nno terminal here\nwarn javascript on.\nseven eight nine.\nten eleven twelve!"),
      // page poisoned by a brace
      (2L, "one two three.\nfour five six.\nseven eight nine.\nconfig { done."),
      // page poisoned by placeholder text (case-insensitive)
      (3L, "one two three.\nfour five six.\nseven eight nine.\nLorem Ipsum dolor."),
      // only 2 surviving lines -> below minLines, page dropped
      (4L, "one two three.\nfour five six.\nnope\nalso nope")
    ).toDF("doc_id", "text")
    val out = CorpusOps.c4LineClean(docs, col("doc_id"), col("text"),
        minWords = 3, minLines = 3)
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._1) === Seq(1L), "only doc 1 survives the page rules")
    val (_, n, text) = out.head
    assert(n === 4L)
    assert(text === "one two three.\nfour five six?\nseven eight nine.\nten eleven twelve!",
      "2-word, terminal-less, and javascript lines are cut; order kept")
  }

  test("c4LineClean honors quote terminals and the word floor") {
    val docs = Seq((9L, "he said \"stop right there\"\na b c d.\nx y.\nw x y z!")).toDF("doc_id", "text")
    val out = CorpusOps.c4LineClean(docs, col("doc_id"), col("text"),
        minWords = 4, minLines = 2)
      .as[(Long, Long, String)].collect().toSeq
    assert(out.map(_._2) === Seq(3L),
      "quote-terminated line counts; the 3-word line misses the 4-word floor")
    assert(out.head._3.startsWith("he said"))
  }

  test("gopherSignals: each rule vetoes independently; signals are exact") {
    val stops = Seq("the", "a", "of", "and", "to", "in", "is")
    // 240 words, unique bigrams, mean length ~4.6, all 7 stopword kinds
    val base = (1 to 120).map(i =>
      s"wordy$i ${stops(i % 7)}").mkString(" ")
    val docs = Seq(
      (1L, base),                                    // passes everything
      (2L, "too short the a"),                       // word-count floor
      (3L, (1 to 60).map(_ => "ab the a x").mkString(" ")), // mean len < 3
      (4L, (1 to 60).map(i => s"w$i w$i").mkString(" ")),   // no stopwords
      (5L, ("spam ham " * 80) + "the a end")         // top-bigram cap
    ).toDF("doc_id", "text")
    val out = CorpusOps.gopherSignals(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Double, Double, Long, Double, Boolean)]
      .collect().sortBy(_._1)
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._7, "the healthy doc is kept")
    assert(byId(1L)._2 === 240L)
    assert(byId(1L)._5 === 7L, "every stopword kind present")
    assert(!byId(2L)._7 && byId(2L)._2 === 4L)
    assert(!byId(3L)._7 && byId(3L)._3 < 3.0, "mean word length floor")
    assert(!byId(4L)._7 && byId(4L)._5 === 0L, "distinct-stopword floor")
    assert(!byId(5L)._7 && byId(5L)._6 > 0.2, "top-bigram repetition cap")
  }
}

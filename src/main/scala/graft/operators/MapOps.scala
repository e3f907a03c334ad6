package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.FieldSelection

/** Projection / filter / scalar transform operators (SURVEY §2.4).
  * Pure `DataFrame => DataFrame` functions; all codegen'd expressions. */
object MapOps {

  /** InverseMapper parity: (k, v) -> (v, k). Reference:
    * hadoop-mapreduce-client-core .../lib/map/InverseMapper.java:30. */
  def inverse(df: DataFrame, k: String = "k", v: String = "v"): DataFrame = {
    val Seq(c1, c2) = df.columns.toSeq.take(2)
    df.select(col(c2).as(k), col(c1).as(v))
  }

  /** RegexMapper/Grep parity: emit one row per regex match in `textCol`
    * (capture group `group`, 0 = whole match — the reference's GROUP conf),
    * counted. Reference: .../lib/map/RegexMapper.java:36 and
    * hadoop-mapreduce-examples .../examples/Grep.java:59-93 (count job +
    * descending-sort job fused into one plan here — Catalyst handles the
    * two-MR-job pipeline as a single shuffle + sort). */
  def grep(df: DataFrame, textCol: String, pattern: String, group: Int = 0): DataFrame =
    df.select(explode(regexp_extract_all(col(textCol), lit(pattern), lit(group))).as("match"))
      .groupBy("match")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("match"))

  /** TokenCounterMapper + IntSumReducer = WordCount. Reference:
    * hadoop-mapreduce-examples .../examples/WordCount.java:34. */
  def wordCount(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** FieldSelectionMapper parity: cut-style projection with the reference's
    * spec grammar (see [[graft.functions.FieldSelection]]). Emits key/value
    * string columns plus any carried columns. */
  def fieldSelect(
      df: DataFrame,
      lineCol: Column,
      spec: String,
      sep: String = "\t",
      carry: Seq[String] = Nil): DataFrame = {
    val (k, v) = FieldSelection.select(lineCol, spec, sep)
    df.select(carry.map(col) :+ k.as("key") :+ v.as("value"): _*)
  }

  /** Per-document bigram surprisal — the perplexity-style quality signal:
    * score every document by the mean negative log-probability of its
    * bigrams under the corpus's own bigram LM (P(w2|w1) = c(w1,w2)/c(w1·)).
    * Low = predictable/templated text, high = unusual text; both tails are
    * filter candidates. Self-scoring needs no smoothing: every document
    * bigram exists in the corpus LM by construction.
    *
    * Determinism: per-bigram surprisal rounds to 6 dp (identical int-ratio
    * + ln in any IEEE engine), the per-doc mean goes through exact decimal
    * summation (order-independent). Dataflow: explode -> two counts (both
    * map-side partial) -> bigram-keyed join back -> per-doc agg. All
    * shuffles are on short keys; no step holds unbounded state. */
  def bigramSurprisal(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(textCol)
    val bb = df
      .select(idCol.as("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("t")) - 1),
        i => struct(element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val pair = bb.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val first = pair.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val lm = pair.join(first, Seq("w1"))
      .select(col("w1"), col("w2"),
        round(-log(col("c12").cast("double") / col("c1")), 6).as("s"))
    bb.join(lm, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        AggOps.avgExact(col("s")).as("avg_surprisal"))
  }

  /** Vocabulary construction: distinct tokens above a count floor, assigned
    * contiguous ids by (count desc, token asc) — the tokenizer-training /
    * embedding-table step. The corpus-sized work is the explode + one
    * map-side-partial count; the global row_number window then sorts only
    * the POST-FLOOR vocabulary, which is tens of thousands of rows at any
    * corpus scale (the floor cuts the long tail), so the single-partition
    * window is a deliberate, bounded choice — not a corpus sort. */
  def buildVocab(df: DataFrame, textCol: Column, minCount: Long = 2): DataFrame = {
    val counts = df
      .select(explode(graft.functions.TextFunctions.tokens(textCol)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("token"))
    counts.withColumn("token_id", row_number().over(w).cast("long"))
  }

  /** Context-window chunking — split each document into overlapping
    * fixed-token windows, the preprocessing step that fits a corpus to a
    * model's context length. Chunk k covers tokens
    * [k·(size−overlap)+1, k·(size−overlap)+size]; starts advance while
    * `start <= n_tokens − overlap` (plus always one chunk for short docs),
    * so every token is covered and no chunk is fully contained in its
    * predecessor. Pure per-row expressions (tokenize → start sequence →
    * slice per start → posexplode): zero shuffles, embarrassingly parallel,
    * output rows bounded by n_tokens/stride per doc. */
  def chunkDocuments(
      df: DataFrame, idCol: Column, textCol: Column,
      size: Int, overlap: Int = 0): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    val toks = graft.functions.TextFunctions.tokens(textCol)
    val starts = sequence(
      lit(1), greatest(lit(1), org.apache.spark.sql.functions.size(toks) - overlap),
      lit(stride))
    df.select(idCol.as("doc_id"), toks.as("t"), starts.as("starts"))
      .filter(org.apache.spark.sql.functions.size(col("t")) > 0)
      .select(col("doc_id"),
        posexplode(transform(col("starts"),
          st => array_join(slice(col("t"), st, lit(size)), " ")))
          .as(Seq("pos", "chunk")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("chunk_id"),
        col("chunk"),
        (org.apache.spark.sql.functions.size(split(col("chunk"), " ")))
          .cast("long").as("n_tokens"))
  }

  /** Repetition-ratio quality signal (the Gopher/C4-style duplicate-n-gram
    * filter for training corpora): per document, the fraction of its n-grams
    * covered by the single most-repeated n-gram. High ratio = boilerplate /
    * degenerate repetition. Two aggregations over the exploded n-grams; at
    * 100 TB both shuffle on (doc_id, gram) / doc_id, which AQE coalesces —
    * no skew risk since a document's grams are bounded by its length. */
  def repetitionStats(
      df: DataFrame, idCol: Column, textCol: Column, n: Int = 3): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(textCol)
    val grams = df
      .select(idCol.as("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= n)
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), size(col("t")) - (n - 1)),
          i => concat_ws(" ", slice(col("t"), i, lit(n))))).as("g"))
    grams
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(
        sum(col("c")).as("n_ngrams"),
        max(col("c")).as("max_rep"),
        round(max(col("c")).cast("double") / sum(col("c")), 6).as("rep_ratio"))
  }

  /** TF-IDF top-k terms per document — the classic corpus-statistics operator
    * for keyword extraction / quality signals over a training corpus.
    * tf = term count within the doc; idf = ln((N+1)/(df+1)) with N = docs
    * containing at least one token, df = docs containing the term.
    *
    * Dataflow: one explode, two hash aggregations (both map-side partial),
    * a broadcast of the scalar N, a term-keyed join of tf against df (both
    * sides already shuffled on term from their aggs), and a per-doc window
    * for the top-k. No step holds unbounded per-key state: term df rows are
    * one per distinct term, and the window partitions by doc.
    *
    * Determinism: score rounds to 6 dp before ranking; ties break on term, so
    * the top-k set is stable across engines (ln is IEEE-double on both). */
  def tfIdfTopTerms(
      df: DataFrame, idCol: Column, textCol: Column, k: Int = 3): DataFrame = {
    val terms = df
      .select(idCol.as("doc_id"),
        explode(graft.functions.TextFunctions.tokens(textCol)).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // df and N both derive from tf — each (doc, term) appears exactly once
    // there, so countDistinct becomes a plain count AND the exploded-terms
    // exchange is computed once and reused (ReusedExchange) by all three legs
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df_"))
    val nDocs = tf.select("doc_id").distinct().agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        round(col("tf").cast("double") *
          log((col("n_docs").cast("double") + 1.0) / (col("df_").cast("double") + 1.0)),
          6).as("tfidf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Inverted-index build — the token → postings structure a search
    * layer serves from: one row per kept (token, doc) posting with the
    * doc's term frequency and first position, plus the token's TOTAL
    * document frequency (counted before any cap, so IDF stays honest).
    * Postings per token are CAPPED at `maxPostings` docs in ascending
    * doc-id order — the standard stopword guard: a token appearing in
    * every document would otherwise serialize one reducer on the whole
    * corpus (the hot-bucket discipline of the simhash/minhash caps).
    * Emits `(token, df_docs, doc_id, tf, first_pos)`.
    *
    * Scale: tokenize-explode → (token, doc) hash agg (map-side partials
    * absorb within-doc repeats), then the cap through the engine's
    * NATIVE top-k-per-key operator ([[SortOps.topKPerKey]]): per-
    * partition bounded heaps mean only `partitions × tokens ×
    * maxPostings` candidate postings reach the exchange, where the old
    * token-partitioned `row_number` window shuffled and sorted EVERY
    * posting — on a stopword-dense 100 TB corpus that is the difference
    * between a cap and a straggler. */
  def invertedIndex(df: DataFrame, idCol: Column, textCol: Column,
      maxPostings: Int): DataFrame = {
    require(maxPostings >= 1, s"maxPostings must be >= 1: $maxPostings")
    val postings = df
      .select(idCol.as("doc_id"),
        posexplode(graft.functions.TextFunctions.tokens(textCol)))
      .select(col("doc_id"), col("col").as("token"),
        col("pos").cast("long").as("p"))
      .groupBy("token", "doc_id")
      .agg(count(lit(1)).as("tf"), min(col("p")).as("first_pos"))
    val dfreq = postings.groupBy("token")
      .agg(count(lit(1)).as("df_docs"))
    // ascending doc_id is a total order per token (the groupBy grain)
    SortOps.topKPerKey(postings, Seq(col("token")), col("doc_id"),
        maxPostings)
      .join(dfreq, Seq("token"))
      .select(col("token"), col("df_docs"), col("doc_id"), col("tf"),
        col("first_pos"))
  }
}

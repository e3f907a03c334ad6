package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the LLM-data-pipeline surface:
  * tokenization, quality scoring, language-ID heuristic, fingerprinting,
  * and portable (engine-independent) hashing used by dedup/minhash.
  *
  * All pure `Column` expressions (codegen'd, no UDFs) so they push into
  * whole-stage codegen and scale linearly with no driver involvement.
  */
object TextFunctions {

  /** Whitespace tokens, empty strings dropped (Mapper-tokenizer parity with
    * the reference's TokenCounterMapper, reference: hadoop-mapreduce-client-core
    * .../lib/map/TokenCounterMapper.java:35). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish pre-tokenizer regex (GPT-2 style, simplified to the subset both
    * Java and RE2 regex dialects share): contractions, letter runs, digit
    * runs, punctuation runs. This is the token-COUNT surface an LLM-data
    * pipeline budgets with; actual BPE merges happen downstream. */
  val bpePattern: String =
    "'(?:s|d|m|t|ll|ve|re)|[\\p{L}]+|[\\p{N}]+|[^\\s\\p{L}\\p{N}]+"

  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  def bpeishTokenCount(text: Column): Column = size(bpeishTokens(text))

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Fraction of tokens that are stopwords (english heuristic). */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val stops = filter(toks, t => t.isin(stopwords: _*))
    when(size(toks) > 0, size(stops).cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Fraction of non-space characters that are not alphanumeric. */
  def punctRatio(text: Column): Column = {
    val noSpace = regexp_replace(text, "\\s+", "")
    val punct = regexp_replace(noSpace, "[a-zA-Z0-9]", "")
    when(length(noSpace) > 0, length(punct).cast("double") / length(noSpace).cast("double"))
      .otherwise(lit(0.0))
  }

  def avgTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double")).otherwise(lit(0.0))
  }

  /** Simple composite quality score in [0,1]: rewards mid-length docs and
    * stopword presence, penalizes punctuation soup. Deterministic arithmetic
    * only, so it is oracle-checkable. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / lit(50.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val punctPenalty = punctRatio(text)
    greatest(least(lenScore * 0.5 + stopScore * 0.5 - punctPenalty, lit(1.0)), lit(0.0))
  }

  /** n-gram-heuristic language ID: english iff stopword evidence. The driver
    * corpus is synthetic so this is a deterministic classifier surface, not a
    * model. */
  def langIdHeuristic(text: Column): Column =
    when(stopwordRatio(text) > 0.02, lit("en")).otherwise(lit("unk"))

  /** Rolling polynomial (Rabin-Karp-style) document fingerprint:
    * fold over characters, acc = (acc * 31 + codepoint) mod 1e9+7.
    * Same fold is expressible in ANSI SQL (list_reduce), keeping it
    * oracle-checkable; distributes trivially (per-row expression). */
  def fingerprint(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (acc, c) => pmod(acc * 31 + ascii(c), lit(1000000007L)))

  /** PII-style redaction for training corpora: masks emails, URLs, and long
    * digit runs with typed placeholders. Patterns stay in the regex subset
    * where Java and RE2 agree (no backrefs/lookaround), so the transform is
    * oracle-checkable; per-row expression, distributes trivially. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, "\\S+@\\S+\\.\\S+", "<EMAIL>"),
        "https?://\\S+", "<URL>"),
      "[0-9]{4,}", "<NUM>")

  /** Character k-shingles of the token-normalized text (word n-grams joined by
    * a single space), the unit for MinHash/Jaccard dedup. */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= k,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Portable 64-bit-ish hash: first 16 hex chars of md5(seed ':' value).
    * Fixed-width lowercase hex compares lexicographically == numerically, so
    * `min` over these strings is a valid minhash; md5 is identical across
    * engines (unlike murmur/xxhash variants). */
  def portableHash(value: Column, seed: Int): Column =
    substring(md5(concat(lit(seed.toString), lit(":"), value)), 1, 16)

  /** THE portable bucket: first 8 hex of md5 of the key's string form, mod
    * `mod`. Every split/sample/shard operator derives its assignment from
    * this single definition (oracle SQL twin:
    * `CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8) AS BIGINT) % mod`)
    * — one copy, so the bit-stability contract can't silently diverge. */
  def portableBucket(keyCol: Column, mod: Long): Column =
    pmod(conv(substring(md5(keyCol.cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(mod))

  /** THE deterministic corpus order: md5 of the id, id tiebreak — the
    * stable "hash order" every packing/cap/shard/canonical-pick operator
    * shares. */
  def hashOrder(idCol: Column): Seq[Column] =
    Seq(md5(idCol.cast("string")), idCol)

  /** Rendezvous (highest-random-weight) shard assignment — the
    * consistent-hashing cousin of [[portableBucket]]: the key goes to
    * `argmax_s md5(key|s)`. Where a mod bucket reshuffles (n−1)/n of all
    * keys when the shard count changes, rendezvous moves only ~1/(n+1) —
    * the property cache rings, shuffle services, and shard rebalancers
    * depend on. Ties (hash collisions across shards) break on the higher
    * shard id via the struct max; pure per-row expression, no state, no
    * ring metadata. */
  def rendezvousShard(keyCol: Column, shards: Int): Column = {
    require(shards >= 1, s"shards must be >= 1: $shards")
    array_max(transform(sequence(lit(0), lit(shards - 1)),
      s => struct(
        conv(substring(md5(concat_ws("|", keyCol.cast("string"),
          s.cast("string"))), 1, 15), 16, 10).cast("long").as("h"),
        s.as("s"))))
      .getField("s")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for the LLM-data-pipeline surface: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard. All are built from per-row
  * expressions + equi-joins on derived keys, so they scale as
  * shuffle-on-short-key jobs — no pairwise O(n²) stage ever materializes
  * more than (bounded bucket size)² candidates.
  *
  * Hashes are md5-derived ("portable hashes", [[graft.functions.TextFunctions.portableHash]])
  * so every computation is reproducible in any engine for oracle checking.
  */
object DedupOps {

  /** Exact dedup: group identical text by content hash, keep the smallest id.
    * One shuffle on a 32-byte key regardless of document size. */
  def exactDedup(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.groupBy(md5(textCol).as("content_hash"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Per-row MinHash signature: minhash_i = min over shingles of
    * portableHash(shingle, i). Computed entirely inside one expression
    * (array_min over transform) — zero shuffles, embarrassingly parallel. */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map { i =>
      array_min(transform(shinglesCol, s => portableHash(s, i))).as(s"mh_$i")
    }

  /** MinHash-LSH candidate pairs: signatures banded (`bands` bands of
    * `rowsPerBand`), docs sharing any band bucket become a candidate pair,
    * then pairs are verified with exact shingle Jaccard. `minJaccard` filters
    * the verified output. The band self-join is an equi-join on
    * (band_id, band_key) — the classic LSH shuffle, linear in corpus size. */
  def minhashLsh(
      df: DataFrame, idCol: Column, textCol: Column,
      shingleSize: Int = 5, bands: Int = 4, rowsPerBand: Int = 2,
      minJaccard: Double = 0.5): DataFrame = {
    val numHashes = bands * rowsPerBand
    val withSig = df
      .select(idCol.as("doc_id"), wordShingles(textCol, shingleSize).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .select(Seq(col("doc_id"), col("shingles")) ++
        minhashSignature(col("shingles"), numHashes): _*)
    val banded = withSig.select(
      col("doc_id"), col("shingles"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("|", (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}")): _*)
            .as("key"))
      }: _*)).as("bk"))
    val a = banded.select(col("bk"), col("doc_id").as("a"), col("shingles").as("sa"))
    val b = banded.select(col("bk"), col("doc_id").as("b"), col("shingles").as("sb"))
    a.join(b, Seq("bk"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))).cast("double"), 6).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= minJaccard)
  }

  /** Per-row 64-bit SimHash over whitespace tokens, emitted as a 64-char bit
    * string (portable across engines; avoids signed-long edge cases).
    * bit_j = sign of Σ over tokens of (bit j of md5(token) ? +1 : -1).
    * Pure fold expression — no shuffle, no UDF. */
  def simhash64(textCol: Column): Column = {
    val toks = tokens(textCol)
    // per-token 64 contributions (+1/-1), folded into a 64-long accumulator
    def tokenBits(t: Column): Column = {
      val hex = md5(t) // 32 hex chars; use first 16 => 64 bits
      transform(sequence(lit(0), lit(63)), p => {
        val hexChar = substring(hex, 1, 16).substr(floor(p / 4).cast("int") + 1, lit(1))
        val v = (conv(hexChar, 16, 10)).cast("long")
        val bit = pmod(floor(v / pow(lit(2.0), (lit(3) - pmod(p, lit(4))).cast("double"))).cast("long"), lit(2))
        (bit * 2 - 1).cast("long")
      })
    }
    val acc = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (a, t) => zip_with(a, tokenBits(t), (x, y) => x + y))
    array_join(transform(acc, c => when(c > 0, "1").otherwise("0")), "")
  }

  /** n-gram Jaccard near-dup pairs WITHOUT minhash: candidates = pairs sharing
    * at least one shingle, with super-common shingles dropped (bucket cap) to
    * bound the self-join blow-up — the standard scalable trick; exact Jaccard
    * verifies. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: Column, textCol: Column,
      shingleSize: Int = 5, maxBucket: Int = 50, minJaccard: Double = 0.3): DataFrame = {
    val docs = df
      .select(idCol.as("doc_id"), wordShingles(textCol, shingleSize).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val posting = docs
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
    val rare = posting.groupBy("sh").agg(count(lit(1)).as("df_"))
      .filter(col("df_") <= maxBucket).select("sh")
    val pruned = posting.join(rare, Seq("sh"))
    val pairs = pruned.select(col("sh"), col("doc_id").as("a"))
      .join(pruned.select(col("sh"), col("doc_id").as("b")), Seq("sh"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    pairs
      .join(docs.select(col("doc_id").as("a"), col("shingles").as("sa")), Seq("a"))
      .join(docs.select(col("doc_id").as("b"), col("shingles").as("sb")), Seq("b"))
      .select(col("a"), col("b"),
        round(size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))).cast("double"), 6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}

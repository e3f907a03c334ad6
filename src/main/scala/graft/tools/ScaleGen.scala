package graft.tools

import org.apache.spark.sql.functions._

/** Scale-sweep data generator: replicate a testdata `documents` table K× so
  * the dedup/corpus pipelines can be timed at a third scale point (the
  * sf0.01→sf0.1 pair verifies two; a 10× third point catches super-linear
  * surprises before a real cluster does).
  *
  * Replica r>0 gets offset doc_ids and every token after the first prefixed
  * with `r⟨r⟩x` — SAME transformation for all docs of a replica, so each
  * replica preserves the original near-dup structure internally while
  * sharing no shingles across replicas. That keeps the near-dup pair count
  * growing linearly with the factor (a plain copy would make every doc a
  * 10-way cross-replica near-dup and measure the DATA's quadratic blowup,
  * not the algorithm's scaling).
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dest = args.lift(1).getOrElse("target/scale10")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    // optional 4th arg: comma-separated table subset — regenerating ONE
    // table at a deeper factor must not force rewriting the other three
    // (e.g. the r10 100x lineitem point next to an existing 100x corpus)
    val tables = args.lift(3).map(_.split(",").toSet)
      .getOrElse(Set("documents", "embeddings", "events", "lineitem"))
    val spark = graft.core.Graft.session("scale-gen")
    if (tables("documents")) {
    val docs = graft.core.Graft.table(spark, src, "documents")
    val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1
    val out = (0 until factor)
      .map { r =>
        if (r == 0) docs
        else {
          // length() must measure the REPLACED text — selecting both in one
          // projection would resolve length(col("text")) against the input
          val perturbed = regexp_replace(col("text"), " ", s" r${r}x")
          docs.select(
            (col("doc_id") + lit(r * maxId)).as("doc_id"),
            perturbed.as("text"),
            col("lang"), col("source"),
            length(perturbed).cast("long").as("n_chars"))
        }
      }
      .reduce(_ unionByName _)
    out.write.mode("overwrite").parquet(s"$dest/documents.parquet")
    val n = spark.read.parquet(s"$dest/documents.parquet").count()
    println(s"[scalegen] wrote $n docs (${factor}x of $src) to $dest")
    }

    // embeddings: replica r rotates each vector by r positions — offset ids,
    // norm preserved, direction changed, so replicas aren't degenerate
    // duplicates and ANN bucket structure grows honestly with the factor
    if (tables("embeddings")) {
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val maxVec = emb.agg(max("vec_id")).head().getLong(0) + 1
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    require(factor <= 2 * dim,
      s"rotation+flip distinguishes at most 2*dim=${2 * dim} replicas")
    val embOut = (0 until factor)
      .map { r =>
        // rotation wraps at the vector dimension; on exact wraparound
        // (r a multiple of dim) flip the sign instead, so no replica is a
        // verbatim copy of another
        val rot = r % dim
        val rotated =
          if (rot == 0) col("embedding")
          else concat(
            slice(col("embedding"), lit(rot + 1), size(col("embedding")) - rot),
            slice(col("embedding"), lit(1), lit(rot)))
        val perturbed =
          if (r == 0) rotated
          else if (rot == 0) transform(rotated, x => negate(x))
          else rotated
        if (r == 0) emb
        else emb.select(
          (col("vec_id") + lit(r * maxVec)).as("vec_id"),
          perturbed.as("embedding"),
          col("label"))
      }
      .reduce(_ unionByName _)
    embOut.write.mode("overwrite").parquet(s"$dest/embeddings.parquet")
    val ne = spark.read.parquet(s"$dest/embeddings.parquet").count()
    println(s"[scalegen] wrote $ne embeddings (${factor}x of $src) to $dest")
    }

    // events: replica r offsets event and user ids, timestamps unchanged —
    // the user population grows with the factor while every user keeps an
    // unmodified event history, so per-user analytics (funnel, retention,
    // interval merge, transitions) scale in the entity count, which is the
    // axis they grow on in production
    if (tables("events")) {
    val ev = graft.core.Graft.table(spark, src, "events")
    val evMax = ev.agg(max("event_id"), max("user_id")).head()
    val maxEid = evMax.getLong(0) + 1
    val maxUid = evMax.getLong(1) + 1
    val evOut = (0 until factor)
      .map { r =>
        if (r == 0) ev
        else ev.select(
          (col("event_id") + lit(r * maxEid)).as("event_id"),
          col("ts"),
          (col("user_id") + lit(r * maxUid)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }
      .reduce(_ unionByName _)
    evOut.write.mode("overwrite").parquet(s"$dest/events.parquet")
    val nev = spark.read.parquet(s"$dest/events.parquet").count()
    println(s"[scalegen] wrote $nev events (${factor}x of $src) to $dest")
    }

    // lineitem: replica r offsets order/part/supp keys — each replica
    // preserves the per-order item sets (and so the degree distribution)
    // verbatim, so the graph family's edge count scales ~linearly with
    // the factor while every per-iteration join/agg sees factor-x honest
    // work. BRIDGES (new r9): a plain offset makes replicas DISJOINT
    // components, so a fixed-seed BFS frontier never enters them and the
    // deep scale point measures nothing (the r8 ×100 artifact: decade
    // factor 1.03). Two small, disjoint row fractions keep ONE original
    // key each: ~1% of orders keep l_suppkey (edges replica-part ↔
    // original-supplier connect the part↔supplier bipartite graph) and
    // ~1% keep l_partkey (replica orders containing an original part
    // connect the same-order co-purchase graph). The other keys still
    // offset, so bridge rows create genuinely new cross-replica edges;
    // degree distributions shift only on the ~2% bridge rows.
    if (tables("lineitem")) {
    val li = graft.core.Graft.table(spark, src, "lineitem")
    val liMax = li.agg(max("l_orderkey"), max("l_partkey"), max("l_suppkey"))
      .head()
    val (maxOk, maxPk, maxSk) =
      (liMax.getLong(0) + 1, liMax.getLong(1) + 1, liMax.getLong(2) + 1)
    val liOut = (0 until factor)
      .map { r =>
        if (r == 0) li
        else {
          val suppBridge = col("l_orderkey") % 101 === 0
          val partBridge = !suppBridge && col("l_orderkey") % 97 === 0
          li
            .withColumn("_sb", suppBridge)
            .withColumn("_pb", partBridge)
            .withColumn("l_orderkey", col("l_orderkey") + lit(r * maxOk))
            .withColumn("l_partkey", when(col("_pb"), col("l_partkey"))
              .otherwise(col("l_partkey") + lit(r * maxPk)))
            .withColumn("l_suppkey", when(col("_sb"), col("l_suppkey"))
              .otherwise(col("l_suppkey") + lit(r * maxSk)))
            .drop("_sb", "_pb")
        }
      }
      .reduce(_ unionByName _)
    liOut.write.mode("overwrite").parquet(s"$dest/lineitem.parquet")
    val nli = spark.read.parquet(s"$dest/lineitem.parquet").count()
    println(s"[scalegen] wrote $nli lineitems (${factor}x of $src) to $dest")
    }
    spark.stop()
  }
}

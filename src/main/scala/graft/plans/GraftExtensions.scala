package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes the engine's native Catalyst
  * functions available to ANY session (including pure-SQL users) via
  * `spark.sql.extensions=graft.plans.GraftExtensions` — the idiomatic way to
  * ship custom expressions without forking Spark. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => NativeFunctions.build(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hamming"),
      new ExpressionInfo(classOf[HammingDistance].getName, "graft_hamming"),
      (exprs: Seq[Expression]) => HammingDistance(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (exprs: Seq[Expression]) => JaroWinkler(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_intersect"),
      new ExpressionInfo(classOf[SortedIntersect].getName, "graft_sorted_intersect"),
      (exprs: Seq[Expression]) => SortedIntersect(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_normalize"),
      new ExpressionInfo(classOf[NormalizeText].getName, "graft_normalize"),
      (exprs: Seq[Expression]) => NormalizeText(exprs(0),
        if (exprs.length > 1) exprs(1).eval().toString else "NFC")))
    // conf-gated (spark.graft.rangeJoin.bucketWidth); no-op otherwise
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
    // the SQL surface for TxLog tables: rewrites GraftCatalog relations
    // into snapshot plans and DELETE/UPDATE/MERGE statements into the
    // oracle-gated verbs (no-op for every other plan)
    ext.injectResolutionRule(session => GraftSqlResolution(session))
    // maintenance statements standard SQL has no grammar for:
    // OPTIMIZE [TARGET n | ZORDER BY (...)], VACUUM, DESCRIBE HISTORY —
    // a strict-superset delegating parser (Delta's own pattern)
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // whole-operator custom plan: two-phase bounded-heap top-k per key
    ext.injectPlannerStrategy(_ =>
      org.apache.spark.sql.graftbridge.TopKPerKeyStrategy)
  }
}

package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two numeric arrays.
  *
  * The ANN hot path (SimilarityOps) evaluates a dot product per candidate
  * pair; the `functions.aggregate`/`zip_with` formulation is a higher-order
  * expression that Spark executes INTERPRETED (lambda variables block
  * whole-stage codegen), allocating an array per row. This expression
  * generates a tight fused Java loop (`doGenCode`), keeping the scan inside
  * WholeStageCodegen — the (b) tier of the custom-operator preference order
  * (Expression beats UDF).
  *
  * Accumulation is a sequential left-to-right fold in doubles, identical to
  * the HOF formulation and to the DuckDB oracle, so results stay bit-stable
  * across engines. Float arrays arrive via an implicit elementwise cast to
  * double (same as `x.cast("double")` in the HOF form).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    // zero-norm / empty arrays: cosine is undefined; return 0.0 ("no
    // similarity") rather than NaN, whose sort order diverges across engines
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv;
         |  $nx += $xv * $xv;
         |  $ny += $yv * $yv;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0
         |  : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}

/** Column-level API + SQL registration for the native expressions. */
object NativeFunctions {

  /** The expression itself expects array<double>; numeric arrays of any
    * element type are accepted here via an explicit elementwise Cast (what
    * ImplicitCastInputTypes would have inserted). */
  private[graft] def build(a: Expression, b: Expression): CosineSimilarity =
    CosineSimilarity(
      Cast(a, ArrayType(DoubleType)), Cast(b, ArrayType(DoubleType)))

  def cosine_similarity(a: Column, b: Column): Column =
    SqlBridge.column(build(SqlBridge.expression(a), SqlBridge.expression(b)))

  def hamming_distance(a: Column, b: Column): Column =
    SqlBridge.column(
      HammingDistance(SqlBridge.expression(a), SqlBridge.expression(b)))

  def normalize_text(c: Column, form: String = "NFC"): Column =
    SqlBridge.column(NormalizeText(SqlBridge.expression(c), form))

  def jaro_winkler(a: Column, b: Column): Column =
    SqlBridge.column(
      JaroWinkler(SqlBridge.expression(a), SqlBridge.expression(b)))

  /** Merge-walk intersection of two sorted duplicate-free array<bigint>
    * columns ([[SortedIntersect]]); callers own the sortedness contract. */
  def sorted_intersect(a: Column, b: Column): Column =
    SqlBridge.column(
      SortedIntersect(SqlBridge.expression(a), SqlBridge.expression(b)))

  /** Bloom-filter build/probe — Spark ships these Catalyst expressions for
    * its own runtime-filter pushdown but does not SQL-register them; the
    * bridge exposes them as engine surface (build over xxhash64(key) longs,
    * probe stays codegen'd — a UDF here would break whole-stage codegen on
    * the probe side, which scans the big table). */
  def bloom_filter_agg(hashedKey: Column, numItems: Long, numBits: Long): Column =
    SqlBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        SqlBridge.expression(hashedKey),
        org.apache.spark.sql.catalyst.expressions.Literal(numItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
        .toAggregateExpression())

  def might_contain(bloom: Column, hashedKey: Column): Column =
    SqlBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        SqlBridge.expression(bloom), SqlBridge.expression(hashedKey)))

  /** Register the native functions for SQL use on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine",
      exprs => build(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hamming",
      exprs => HammingDistance(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaro_winkler",
      exprs => JaroWinkler(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_intersect",
      exprs => SortedIntersect(exprs(0), exprs(1)),
      "built-in")
    // graft_normalize(s[, 'NFC'|'NFD'|'NFKC'|'NFKD']) — form must be a
    // literal (it is baked into the generated code)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_normalize",
      exprs => NormalizeText(exprs(0),
        if (exprs.length > 1) exprs(1).eval().toString else "NFC"),
      "built-in")
    // SQL-text access to the bloom pair Spark leaves unregistered:
    // graft_bloom_agg(xxhash64(k), items, bits) / graft_might_contain(bf, h)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
        .toAggregateExpression(),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }
}

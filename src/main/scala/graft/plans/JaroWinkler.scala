package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ExpectsStringPair
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level Jaro-Winkler similarity kernel.
  *
  * Semantics pinned to the common C/C++ reference implementations (and the
  * DuckDB oracle, verified empirically): operates on UTF-8 *bytes*, match
  * window `max(len)/2 - 1`, transpositions = differing matched positions
  * `/ 2` in integer arithmetic, Winkler prefix bonus (≤ 4 bytes, scale 0.1)
  * applied only when the Jaro score exceeds 0.7, and any empty input —
  * including both empty — scores 0.0.
  *
  * Standalone object (not the expression's companion) so the generated
  * code can call it through the JVM static forwarder without relying on
  * companion-class forwarder emission rules. */
object JaroWinklerKernel {
  def compute(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s2(j) == s1(i)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var diff = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) diff += 1
        k += 1
      }
      i += 1
    }
    val t = diff / 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (m - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxPrefix = math.min(4, math.min(l1, l2))
    while (l < maxPrefix && s1(l) == s2(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** Native Catalyst expression: Jaro-Winkler similarity between two strings
  * — the standard scorer for name/title fuzzy matching and record linkage,
  * which Spark does not ship (only `levenshtein`).
  *
  * A Scala UDF would break whole-stage codegen on the candidate-pair scan
  * this feeds (blocked fuzzy joins evaluate the scorer once per candidate
  * pair, the hot path); this stays fused, invoking the kernel as a static
  * call — tier (b) of the custom-operator preference order, like
  * [[HammingDistance]]. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsStringPair with Serializable {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.JaroWinklerKernel.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_jaro_winkler"
}

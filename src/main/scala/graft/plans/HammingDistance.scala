package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ExpectsStringPair
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Hamming distance between two same-alphabet
  * strings (the simhash near-dup verifier — signatures are 64-char '0'/'1'
  * strings, so byte compare == char compare). Position-wise differing bytes
  * over the common prefix plus the length difference.
  *
  * A `transform`/`filter` higher-order formulation would run interpreted and
  * allocate per row; this generates a fused byte loop inside WholeStageCodegen
  * — same rationale as [[CosineSimilarity]], the (b) tier of the
  * custom-operator preference order. */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsStringPair with Serializable {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].getBytes
    val y = b.asInstanceOf[UTF8String].getBytes
    val n = math.min(x.length, y.length)
    var d = math.abs(x.length - y.length)
    var i = 0
    while (i < n) {
      if (x(i) != y(i)) d += 1
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xb = ctx.freshName("xb")
      val yb = ctx.freshName("yb")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      s"""
         |byte[] $xb = $a.getBytes();
         |byte[] $yb = $b.getBytes();
         |int $n = java.lang.Math.min($xb.length, $yb.length);
         |int $d = java.lang.Math.abs($xb.length - $yb.length);
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($xb[$i] != $yb[$i]) $d++;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_hamming"
}

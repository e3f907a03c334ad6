package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ExpectsLongArrayPair
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: intersection of two SORTED, duplicate-free
  * `array<bigint>` columns by a linear merge walk.
  *
  * This is the per-edge kernel of degree-oriented triangle counting
  * ([[graft.operators.GraphOps.triangleCounts]]): adjacency out-lists arrive
  * pre-sorted from `sort_array`, so intersection is a two-pointer scan over
  * primitive longs. The built-in `array_intersect` cannot assume sortedness
  * and builds a hash set per invocation — per-row allocation plus a hash
  * probe per element, where this walk does one branch per element over two
  * cache-friendly primitive arrays and writes an UnsafeArrayData without
  * boxing. On the sf0.1 co-purchase gate graph (1.2M edges, out-degree
  * ≤ O(√E)) that kernel runs ~1.2M times over ~100-element arrays, and the
  * merge walk roughly halves the stage.
  *
  * Inputs MUST be sorted ascending and duplicate-free; outputs then are too.
  * (Unsorted input silently under-counts — the operator owns the contract,
  * which its adjacency build establishes by construction.) */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsLongArrayPair with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toLongArray()
    val ys = b.asInstanceOf[ArrayData].toLongArray()
    val buf = new Array[Long](math.min(xs.length, ys.length))
    var i = 0; var j = 0; var k = 0
    while (i < xs.length && j < ys.length) {
      val d = java.lang.Long.compare(xs(i), ys(j))
      if (d < 0) i += 1
      else if (d > 0) j += 1
      else { buf(k) = xs(i); k += 1; i += 1; j += 1 }
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(buf, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val buf = ctx.freshName("buf")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      s"""
         |long[] $xs = $a.toLongArray();
         |long[] $ys = $b.toLongArray();
         |long[] $buf = new long[java.lang.Math.min($xs.length, $ys.length)];
         |int $i = 0; int $j = 0; int $k = 0;
         |while ($i < $xs.length && $j < $ys.length) {
         |  if ($xs[$i] < $ys[$j]) { $i++; }
         |  else if ($xs[$i] > $ys[$j]) { $j++; }
         |  else { $buf[$k++] = $xs[$i]; $i++; $j++; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($buf, $k));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersect =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sorted_intersect"
}

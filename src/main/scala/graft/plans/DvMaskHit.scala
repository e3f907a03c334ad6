package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ExpectsStringLong
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Native deletion-vector membership probe: `true` iff row position `pos`
  * of part file `file` is masked by the broadcast (file → sorted
  * positions) map — the small-vector fast path of
  * [[graft.sources.TxLog]]'s masked reader.
  *
  * Why an expression and not the anti-join: the mask join keys on the
  * part-file URI STRING, so a hash anti-join pays a ~150-byte string hash
  * + probe per row — measured at the 60M-row decade point, that probe is
  * ~25× the underlying column scan (6.5 s vs 0.26 s; the broadcast hint
  * alone recovered little, BENCH_SCALE `dv_delete_r11` x100 arm). This
  * expression exploits what the join cannot: `_metadata.file_path` is
  * CONSTANT PER SPLIT, so the string work is memoized — one map lookup
  * when the file changes (twice per split in practice), and every other
  * row pays one cached-string equality check plus a primitive binary
  * search over that file's sorted positions. Codegen'd, so the filter
  * stays inside whole-stage codegen; the mask map rides an ordinary Spark
  * broadcast (sidecar-sized, gated by `spark.graft.dvBroadcastBytes` —
  * vectors too large to broadcast keep the anti-join path, the same
  * two-regime split Spark itself makes for joins).
  *
  * (Public precedent for reader-level masking: Delta's deletion vectors
  * are applied inside the scan via roaring bitmaps; this is the same idea
  * expressed as a Catalyst predicate instead of a custom reader.) */
case class DvMaskHit(left: Expression, right: Expression,
    masks: Broadcast[java.util.HashMap[String, Array[Long]]])
    extends BinaryExpression with ExpectsStringLong with Serializable {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "dv_mask_hit"

  // task-local memo: expressions are deserialized per task, so plain
  // transient fields are safe; lastArr == null encodes "file unbound"
  @transient private var lastFile: UTF8String = _
  @transient private var lastArr: Array[Long] = _
  @transient private var lastSet = false

  override def nullSafeEval(file: Any, pos: Any): Any = {
    val f = file.asInstanceOf[UTF8String]
    if (!lastSet || !f.equals(lastFile)) {
      lastFile = f.clone()
      lastArr = masks.value.get(f.toString)
      lastSet = true
    }
    lastArr != null &&
      java.util.Arrays.binarySearch(lastArr, pos.asInstanceOf[Long]) >= 0
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("dvMasks", masks,
      classOf[Broadcast[java.util.HashMap[String, Array[Long]]]].getName)
    val lastF = ctx.addMutableState("UTF8String", "dvLastFile")
    val lastA = ctx.addMutableState("long[]", "dvLastArr")
    val lastS = ctx.addMutableState("boolean", "dvLastSet")
    nullSafeCodeGen(ctx, ev, (f, p) => {
      s"""
       |if (!$lastS || !$f.equals($lastF)) {
       |  $lastF = $f.clone();
       |  $lastA = (long[]) ((java.util.HashMap) $bc.value()).get($f.toString());
       |  $lastS = true;
       |}
       |${ev.value} = $lastA != null &&
       |  java.util.Arrays.binarySearch($lastA, $p) >= 0;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

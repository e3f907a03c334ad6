package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ExpectsSingleString
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode normalization (NFC/NFD/NFKC/NFKD).
  *
  * Spark has no built-in normalizer, yet cross-form canonicalization is a
  * dedup prerequisite — "café" composed (U+00E9) and decomposed
  * (e + U+0301) are different byte strings that hash apart until
  * normalized. A Scala UDF here would break whole-stage codegen on the
  * corpus scan; this generates a direct `java.text.Normalizer` call inside
  * the fused loop (tier (b) of the custom-operator preference order, like
  * [[CosineSimilarity]] / [[HammingDistance]]). */
case class NormalizeText(child: Expression, form: String)
    extends UnaryExpression with ExpectsSingleString with Serializable {

  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"form must be NFC/NFD/NFKC/NFKD: $form")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(java.text.Normalizer.normalize(" +
        s"$c.toString(), java.text.Normalizer.Form.$form))")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)

  override def prettyName: String = "graft_normalize"
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `nfc_normalize(s)`: Unicode NFC canonical composition — the
 * normalization step every multilingual corpus pipeline runs before
 * hashing or dedup (the SAME visible text arrives precomposed from
 * one crawler and decomposed from another; unnormalized, exact-hash
 * dedup silently misses those duplicates and token counts disagree
 * with downstream tokenizers). Spark ships no Unicode normalizer, so
 * this is a native codegen expression over `java.text.Normalizer`
 * (UAX #15, same algorithm DuckDB's `nfc_normalize` implements — the
 * oracle is therefore an independent second implementation, not a
 * replay). Per-row, stays inside whole-stage codegen.
 */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(c)
}

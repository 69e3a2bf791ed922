package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Greedy longest-match-first WordPiece segmentation under a baked-in
 * vocabulary — the encode core of the likelihood-scored tokenizer
 * ([[graft.operators.TextAnalysis.wordpieceTrain]]; the algorithm is
 * the public MaxMatch walk of Schuster & Nakajima 2012 as popularized
 * by BERT's tokenizer). At each position the LONGEST vocabulary piece
 * matching there is taken; a position where nothing matches maps the
 * WHOLE word to `[UNK]` (exactly one piece) — the canonical WordPiece
 * failure semantics, not a per-character fallback.
 *
 * Walk is code-point indexed (a supplementary-plane character is one
 * position) and O(len · maxPieceLen) substring probes per word against
 * an interned hash set — same per-row cost envelope as the BPE/unigram
 * encode expressions, fully inside whole-stage codegen.
 */
private[graft] object WordPieceMatch {

  final class Model(vocab: Seq[String], val maxLen: Int) extends Serializable {
    @transient lazy val set: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String](vocab.size * 2)
      vocab.foreach(s.add)
      s
    }
  }

  /** (pieceCount, isUnk) of the greedy walk, packed as `np << 1 | unk`. */
  def walk(w: String, m: Model): Int = {
    val L = w.codePointCount(0, w.length)
    if (L == 0) return 0
    val offs = new Array[Int](L + 1)
    var o = 0
    var i = 0
    while (i < L) { offs(i) = o; o += Character.charCount(w.codePointAt(o)); i += 1 }
    offs(L) = w.length
    var pos = 0
    var np = 0
    while (pos < L) {
      var lp = math.min(m.maxLen, L - pos)
      var matched = 0
      while (lp >= 1 && matched == 0) {
        if (m.set.contains(w.substring(offs(pos), offs(pos + lp)))) matched = lp
        else lp -= 1
      }
      if (matched == 0) return (1 << 1) | 1 // whole word -> [UNK]
      np += 1
      pos += matched
    }
    np << 1
  }
}

/** `wordpiece_stats(word)`: `struct<np int, unk boolean>` — the greedy
  * segmentation's piece count and whether the word fell to `[UNK]`.
  * One struct per word so the walk runs once for both outputs. */
case class WordPieceStats(child: Expression, vocab: Seq[String], maxPieceLen: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("np", IntegerType, nullable = false),
    StructField("unk", BooleanType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "wordpiece_stats"

  @transient private lazy val model =
    new WordPieceMatch.Model(vocab, maxPieceLen)

  def stats(w: UTF8String): InternalRow = {
    val packed = WordPieceMatch.walk(w.toString, model)
    new GenericInternalRow(Array[Any](packed >> 1, (packed & 1) == 1))
  }

  override protected def nullSafeEval(w: Any): Any = stats(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wp", this, classOf[WordPieceStats].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $ref.stats($w);")
  }

  override protected def withNewChildInternal(c: Expression): WordPieceStats =
    copy(child = c)
}

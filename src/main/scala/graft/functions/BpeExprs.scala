package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `bpe_piece_count(word)`: the number of BPE pieces a word tokenizes
 * into under a baked-in merge list — the fused replacement for the
 * R-deep nested `aggregate` higher-order-function fold
 * ([[graft.operators.TextAnalysis.bpeEncode]]'s original spelling),
 * whose R interpreted array rebuilds per word dominated the encode
 * keys (HOF lambdas never enter codegen).
 *
 * Value-identical replay of the fold semantics: the word decomposes
 * into its initial symbol alphabet (code points, or two-hex-char UTF-8
 * byte symbols when `byteMode`), then each merge `(a, b)` in list
 * order runs ONE greedy left-to-right pass — replace the accumulated
 * tail `a` when the incoming symbol is `b`; a just-merged tail `a+b`
 * can never re-match `a`, so no double merge at one position. Only the
 * final piece COUNT survives (both encode entry points consume
 * `size(enc(w))` alone), so symbols never materialize as strings:
 * every symbol that can participate in any merge is interned to a
 * dense int id at construction (the dictionary is merge-list-bounded:
 * `a`, `b`, `a+b` per round), non-participating symbols map to -1,
 * and each merge pass is an in-place int-array scan — O(len · R) int
 * compares per word with one scratch allocation, instead of R boxed
 * tree evaluations per element.
 *
 * Codegen calls back into the compiled [[count]] via a reference
 * object, so the expression stays inside whole-stage codegen spans.
 */
case class BpePieceCount(child: Expression, merges: Seq[(String, String)],
                         byteMode: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_piece_count"

  // merge-list-bounded interning: every string that can appear as a
  // merge operand or product gets a dense id; everything else is -1
  // and can never compare equal to an operand
  @transient private lazy val dict: java.util.HashMap[String, Integer] = {
    val d = new java.util.HashMap[String, Integer]()
    def intern(s: String): Unit = if (!d.containsKey(s)) d.put(s, d.size())
    merges.foreach { case (a, b) => intern(a); intern(b); intern(a + b) }
    d
  }
  private def idOf(s: String): Int = {
    val v = dict.get(s); if (v == null) -1 else v.intValue()
  }
  @transient private lazy val mergeA: Array[Int] = merges.map(m => idOf(m._1)).toArray
  @transient private lazy val mergeB: Array[Int] = merges.map(m => idOf(m._2)).toArray
  @transient private lazy val mergeAB: Array[Int] = merges.map(m => idOf(m._1 + m._2)).toArray
  // byte mode: initial symbols are the 256 two-hex-char strings
  @transient private lazy val byteId: Array[Int] =
    Array.tabulate(256)(i => idOf(f"$i%02X"))
  // char mode: initial symbols are single code points
  @transient private lazy val charId: java.util.HashMap[Integer, Integer] = {
    val m = new java.util.HashMap[Integer, Integer]()
    dict.forEach { (s, id) =>
      if (s.codePointCount(0, s.length) == 1) m.put(s.codePointAt(0), id)
    }
    m
  }

  /** Piece count of one word (the codegen callback). */
  def count(word: UTF8String): Int = {
    // initial symbol ids
    var syms: Array[Int] = null
    var n = 0
    if (byteMode) {
      val nb = word.numBytes()
      syms = new Array[Int](nb)
      var i = 0
      while (i < nb) { syms(i) = byteId(word.getByte(i) & 0xFF); i += 1 }
      n = nb
    } else {
      val s = word.toString
      syms = new Array[Int](s.length) // >= code point count
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        val v = charId.get(cp)
        syms(n) = if (v == null) -1 else v.intValue()
        n += 1
        i += Character.charCount(cp)
      }
    }
    // replay each merge as one in-place greedy pass
    var r = 0
    while (r < mergeA.length && n > 1) {
      val a = mergeA(r); val b = mergeB(r); val ab = mergeAB(r)
      var w = 0
      var i = 0
      while (i < n) {
        val cur = syms(i)
        if (w > 0 && syms(w - 1) == a && cur == b) syms(w - 1) = ab
        else { syms(w) = cur; w += 1 }
        i += 1
      }
      n = w
      r += 1
    }
    n
  }

  override protected def nullSafeEval(w: Any): Any = count(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpe", this, classOf[BpePieceCount].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $ref.count($w);")
  }

  override protected def withNewChildInternal(c: Expression): BpePieceCount =
    copy(child = c)
}

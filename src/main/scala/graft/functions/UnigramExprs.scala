package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Shared integer-Viterbi segmentation under a baked-in unigram
 * vocabulary — the encode/E-step core of the deterministic unigram-LM
 * tokenizer ([[graft.operators.TextAnalysis.unigramTrain]]). The
 * objective is the exact-integer surrogate of unigram max-likelihood:
 * maximizing Σ log(c_i/C) = −n·log C + Σ log c_i is dominated by its
 * first term, so the segmentation minimizes the PIECE COUNT n and
 * breaks ties by maximizing the integer count sum Σ c_i — a total,
 * engine-replayable order with no floating log anywhere (the same
 * exactness discipline as the BPE chain and the q-digest).
 *
 * DP (backward, code-point indexed): dp[L] = (0, 0);
 * dp[i] = best over pieces p matching at i of
 * (dp[i+|p|].np + 1, dp[i+|p|].sc + c(p)), "best" = smaller np, then
 * larger sc. A single character ABSENT from the vocabulary is still a
 * candidate with count 0 (the UNK fallback — progress is always
 * possible on unseen input; never triggered on the training corpus,
 * whose alphabet is vocabulary-closed by construction). Reconstruction
 * (forward): at each position take the candidate minimizing
 * (np', −sc', −len) — i.e. ties between optimal pieces go to the
 * LONGEST, which is unique (one piece per length matches at a
 * position). Both passes are O(L · maxPieceLen) int work per word
 * with vocabulary lookups against an interned hash map.
 */
private[functions] object UnigramDp {

  final class Model(vocab: Seq[(String, Long)], val maxLen: Int)
      extends Serializable {
    @transient lazy val counts: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long]()
      vocab.foreach { case (p, c) => m.put(p, java.lang.Long.valueOf(c)) }
      m
    }
  }

  /** Backward dp over the word's code points: returns (np, sc) arrays
    * of length L+1 plus the code-point offsets table. */
  private def dp(w: String, m: Model): (Array[Int], Array[Long], Array[Int]) = {
    val L = w.codePointCount(0, w.length)
    // offs(i) = UTF-16 offset of code point i (offs(L) = w.length)
    val offs = new Array[Int](L + 1)
    var o = 0
    var i = 0
    while (i < L) { offs(i) = o; o += Character.charCount(w.codePointAt(o)); i += 1 }
    offs(L) = w.length
    val np = new Array[Int](L + 1)
    val sc = new Array[Long](L + 1)
    var p = L - 1
    while (p >= 0) {
      var bnp = Int.MaxValue
      var bsc = Long.MinValue
      var lp = 1
      val maxLp = math.min(m.maxLen, L - p)
      while (lp <= maxLp) {
        val piece = w.substring(offs(p), offs(p + lp))
        var c = m.counts.get(piece)
        if (c == null && lp == 1) c = java.lang.Long.valueOf(0L)
        if (c != null) {
          val cnp = np(p + lp) + 1
          val csc = sc(p + lp) + c.longValue()
          if (cnp < bnp || (cnp == bnp && csc > bsc)) { bnp = cnp; bsc = csc }
        }
        lp += 1
      }
      np(p) = bnp; sc(p) = bsc
      p -= 1
    }
    (np, sc, offs)
  }

  /** Optimal piece count of `w`. */
  def pieceCount(w: String, m: Model): Int =
    if (w.isEmpty) 0 else dp(w, m)._1(0)

  /** The optimal segmentation's pieces, longest-piece tie-break. */
  def pieces(w: String, m: Model): Array[String] = {
    if (w.isEmpty) return Array.empty
    val (np, sc, offs) = dp(w, m)
    val L = np.length - 1
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < L) {
      var bnp = Int.MaxValue
      var bsc = Long.MinValue
      var blp = 0
      var bp: String = null
      var lp = math.min(m.maxLen, L - pos)
      // descending lp with strict improvement => ties keep the longest
      while (lp >= 1) {
        val piece = w.substring(offs(pos), offs(pos + lp))
        var c = m.counts.get(piece)
        if (c == null && lp == 1) c = java.lang.Long.valueOf(0L)
        if (c != null) {
          val cnp = np(pos + lp) + 1
          val csc = sc(pos + lp) + c.longValue()
          if (cnp < bnp || (cnp == bnp && csc > bsc)) {
            bnp = cnp; bsc = csc; blp = lp; bp = piece
          }
        }
        lp -= 1
      }
      out += bp
      pos += blp
    }
    out.toArray
  }
}

/** `unigram_piece_count(word)`: optimal Viterbi piece count under the
  * baked-in vocabulary — the encode-side fused expression (the
  * [[BpePieceCount]] pattern: codegen calls back into the compiled
  * DP, so the expression stays inside whole-stage codegen spans). */
case class UnigramPieceCount(child: Expression, vocab: Seq[(String, Long)],
                             maxPieceLen: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_piece_count"

  @transient private lazy val model = new UnigramDp.Model(vocab, maxPieceLen)

  def count(w: UTF8String): Int = UnigramDp.pieceCount(w.toString, model)

  override protected def nullSafeEval(w: Any): Any = count(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("uni", this, classOf[UnigramPieceCount].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $ref.count($w);")
  }

  override protected def withNewChildInternal(c: Expression): UnigramPieceCount =
    copy(child = c)
}

/** `unigram_pieces(word)`: the optimal segmentation itself as
  * `array<string>` — the training loop's E-step (piece usage counting)
  * consumes it; encode never materializes pieces. */
case class UnigramViterbiPieces(child: Expression, vocab: Seq[(String, Long)],
                                maxPieceLen: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_pieces"

  @transient private lazy val model = new UnigramDp.Model(vocab, maxPieceLen)

  def pieces(w: UTF8String): GenericArrayData =
    new GenericArrayData(
      UnigramDp.pieces(w.toString, model).map(UTF8String.fromString(_)))

  override protected def nullSafeEval(w: Any): Any = pieces(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("uni", this, classOf[UnigramViterbiPieces].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $ref.pieces($w);")
  }

  override protected def withNewChildInternal(c: Expression): UnigramViterbiPieces =
    copy(child = c)
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/**
 * `hyperplane_buckets(v)`: all LSH bucket ids of a BIGINT vector against
 * a baked-in hyperplane matrix — `tables` buckets, each from `bits`
 * sign tests. ONE fused loop over a flattened `tables*bits*dim` plane
 * matrix (a codegen reference object), replacing `tables*bits`
 * separate dot-product expressions whose combined tree blew past the
 * efficient-codegen envelope (measured ~40x slower at 100k×16×6×64).
 */
case class HyperplaneBuckets(child: Expression, planes: Array[Long],
                             tables: Int, bits: Int, dim: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(planes.length == tables * bits * dim)
  require(bits > 0 && bits <= 31, s"bits must be in [1, 31]: $bits") // 1 << b wraps past 31

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_buckets"

  override protected def nullSafeEval(vAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var b = 0
      while (b < bits) {
        val off = (t * bits + b) * dim
        var acc = 0L
        var i = 0
        while (i < n) { acc += v.getLong(i) * planes(off + i); i += 1 }
        if (acc >= 0) bucket |= 1 << b
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val t = ctx.freshName("t"); val b = ctx.freshName("b")
      val off = ctx.freshName("off"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i"); val bucket = ctx.freshName("bucket")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |int[] $out = new int[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $bucket = 0;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    int $off = ($t * $bits + $b) * $dim;
         |    long $acc = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += $v.getLong($i) * $planesRef[$off + $i];
         |    }
         |    if ($acc >= 0) $bucket |= 1 << $b;
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneBuckets =
    copy(child = c)
}

/**
 * `dot_argmax(v)`: index of the baked-in row vector with the maximum
 * inner product against `v` (ties → lowest index) — the IVF
 * coarse-quantizer assignment as one fused loop.
 */
case class DotArgmax(child: Expression, matrix: Array[Long], k: Int, dim: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(matrix.length == k * dim && k >= 1)

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_argmax"

  override protected def nullSafeEval(vAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    var best = 0
    var bestDot = Long.MinValue
    var c = 0
    while (c < k) {
      var acc = 0L
      var i = 0
      while (i < n) { acc += v.getLong(i) * matrix(c * dim + i); i += 1 }
      if (acc > bestDot) { bestDot = acc; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("matrix", matrix, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val best = ctx.freshName("best")
      val bestDot = ctx.freshName("bestDot"); val c = ctx.freshName("c")
      val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |int $best = 0;
         |long $bestDot = java.lang.Long.MIN_VALUE;
         |for (int $c = 0; $c < $k; $c++) {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $v.getLong($i) * $matRef[$c * $dim + $i];
         |  }
         |  if ($acc > $bestDot) { $bestDot = $acc; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): DotArgmax =
    copy(child = c)
}

/**
 * `dot_topk_grouped(v)`: the two-level (coarse→fine) IVF probe — scan
 * the `nCoarse` coarse centroids for the top-`cProbe` groups by inner
 * product, then scan ONLY those groups' fine centroids for the top-`k`
 * cells. Returns the winning fine centroid ids ordered by
 * (dot desc, cid asc).
 *
 * This is what replaces the flat O(nCentroids·dim) per-row
 * argmax/sort when `nCentroids ≈ √n` at scale: per-row work drops to
 * O((nCoarse + cProbe·maxGroup)·dim) ≈ O(√nCentroids·dim) with
 * balanced groups, and the plan carries two bounded reference-object
 * matrices instead of `nCentroids` separate dot expressions.
 *
 * Layout: `fine` is the fine-centroid matrix SORTED BY GROUP;
 * `offsets[g]..offsets[g+1]` delimit group g's rows; `cids(pos)` maps a
 * sorted position back to the original centroid id. With k=1 this is
 * the two-level assignment (element 1 of the result); with k=nProbe it
 * is the probe list.
 */
case class DotTopKGrouped(child: Expression, coarse: Array[Long], nCoarse: Int,
                          fine: Array[Long], offsets: Array[Int], cids: Array[Int],
                          cProbe: Int, k: Int, dim: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(coarse.length == nCoarse * dim && nCoarse >= 1)
  require(offsets.length == nCoarse + 1 && offsets(0) == 0)
  require(offsets(nCoarse) * dim == fine.length && cids.length == offsets(nCoarse))
  require(cProbe >= 1 && k >= 1)

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_topk_grouped"

  override protected def nullSafeEval(vAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val nP = math.min(cProbe, nCoarse)
    // coarse pass: top-cProbe groups by (dot desc, gid asc), insertion
    val gd = Array.fill(nP)(Long.MinValue)
    val gi = Array.fill(nP)(-1)
    var g = 0
    while (g < nCoarse) {
      var acc = 0L; var i = 0
      while (i < n) { acc += v.getLong(i) * coarse(g * dim + i); i += 1 }
      var p = nP - 1
      if (acc > gd(p)) {
        while (p > 0 && acc > gd(p - 1)) { gd(p) = gd(p - 1); gi(p) = gi(p - 1); p -= 1 }
        gd(p) = acc; gi(p) = g
      }
      g += 1
    }
    // fine pass over the probed groups only: top-k by (dot desc, cid asc)
    val bd = Array.fill(k)(Long.MinValue)
    val bc = Array.fill(k)(Int.MaxValue)
    var pIdx = 0
    while (pIdx < nP) {
      val grp = gi(pIdx)
      if (grp >= 0) {
        var r = offsets(grp)
        while (r < offsets(grp + 1)) {
          var acc = 0L; var i = 0
          while (i < n) { acc += v.getLong(i) * fine(r * dim + i); i += 1 }
          val cid = cids(r)
          var p = k - 1
          if (acc > bd(p) || (acc == bd(p) && cid < bc(p))) {
            while (p > 0 && (acc > bd(p - 1) || (acc == bd(p - 1) && cid < bc(p - 1)))) {
              bd(p) = bd(p - 1); bc(p) = bc(p - 1); p -= 1
            }
            bd(p) = acc; bc(p) = cid
          }
          r += 1
        }
      }
      pIdx += 1
    }
    val nOut = bc.count(_ != Int.MaxValue)
    new GenericArrayData(bc.take(nOut))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coarseRef = ctx.addReferenceObj("coarse", coarse, "long[]")
    val fineRef = ctx.addReferenceObj("fine", fine, "long[]")
    val offRef = ctx.addReferenceObj("offsets", offsets, "int[]")
    val cidRef = ctx.addReferenceObj("cids", cids, "int[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val nP = ctx.freshName("nP")
      val gd = ctx.freshName("gd"); val gi = ctx.freshName("gi")
      val bd = ctx.freshName("bd"); val bc = ctx.freshName("bc")
      val g = ctx.freshName("g"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i"); val p = ctx.freshName("p")
      val pi = ctx.freshName("pi"); val grp = ctx.freshName("grp")
      val r = ctx.freshName("r"); val cid = ctx.freshName("cid")
      val nOut = ctx.freshName("nOut"); val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |int $nP = java.lang.Math.min($cProbe, $nCoarse);
         |long[] $gd = new long[$nP]; int[] $gi = new int[$nP];
         |java.util.Arrays.fill($gd, java.lang.Long.MIN_VALUE);
         |java.util.Arrays.fill($gi, -1);
         |for (int $g = 0; $g < $nCoarse; $g++) {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $v.getLong($i) * $coarseRef[$g * $dim + $i];
         |  }
         |  int $p = $nP - 1;
         |  if ($acc > $gd[$p]) {
         |    while ($p > 0 && $acc > $gd[$p - 1]) {
         |      $gd[$p] = $gd[$p - 1]; $gi[$p] = $gi[$p - 1]; $p--;
         |    }
         |    $gd[$p] = $acc; $gi[$p] = $g;
         |  }
         |}
         |long[] $bd = new long[$k]; int[] $bc = new int[$k];
         |java.util.Arrays.fill($bd, java.lang.Long.MIN_VALUE);
         |java.util.Arrays.fill($bc, java.lang.Integer.MAX_VALUE);
         |for (int $pi = 0; $pi < $nP; $pi++) {
         |  int $grp = $gi[$pi];
         |  if ($grp >= 0) {
         |    for (int $r = $offRef[$grp]; $r < $offRef[$grp + 1]; $r++) {
         |      long $acc = 0L;
         |      for (int $i = 0; $i < $n; $i++) {
         |        $acc += $v.getLong($i) * $fineRef[$r * $dim + $i];
         |      }
         |      int $cid = $cidRef[$r];
         |      int $p = $k - 1;
         |      if ($acc > $bd[$p] || ($acc == $bd[$p] && $cid < $bc[$p])) {
         |        while ($p > 0 && ($acc > $bd[$p - 1] || ($acc == $bd[$p - 1] && $cid < $bc[$p - 1]))) {
         |          $bd[$p] = $bd[$p - 1]; $bc[$p] = $bc[$p - 1]; $p--;
         |        }
         |        $bd[$p] = $acc; $bc[$p] = $cid;
         |      }
         |    }
         |  }
         |}
         |int $nOut = 0;
         |while ($nOut < $k && $bc[$nOut] != java.lang.Integer.MAX_VALUE) $nOut++;
         |int[] $out = new int[$nOut];
         |System.arraycopy($bc, 0, $out, 0, $nOut);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): DotTopKGrouped =
    copy(child = c)
}

/**
 * `poly_grams(hs)`: all k-gram hashes of a BIGINT hash array, each the
 * double 31-bit polynomial packed as `g1 * 2^31 + g2` — ONE fused
 * rolling loop (O(n) multiply-add-mods total) replacing the interpreted
 * `transform(sequence(...), i -> ...)` lambda whose 2(k-1) boxed
 * tree-node evaluations PER POSITION dominate span dedup's hashing.
 * Value-identical to [[graft.operators.Dedup.spanGramHash]]'s
 * per-position fold (and therefore to the DuckDB oracle): the
 * polynomial Σ (h_j mod M) · B^(k-1-j) mod M is path-independent, so
 * the rolling recurrence `(v - r_out·B^(k-1))·B + r_in (mod M)`
 * computes the same residues the fold does. Documents shorter than k
 * hash to an empty array (the caller's `if(size >= k, …)` guard moves
 * inside).
 *
 * PRECONDITION (as for `spanGramHash`): input hashes must be
 * NON-NEGATIVE. JVM `%` is sign-preserving, so a negative element
 * would produce negative residues and packed values that no longer
 * match the oracle spelling. Every in-repo caller feeds non-negative
 * md5/ascii-derived values; feed arbitrary longs through
 * `pmod(h, lit(Long.MaxValue))` (or similar) first.
 */
case class PolyGrams(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k >= 1)
  import PolyGrams._
  // B^(k-1) mod M, for the rolling eviction of the leaving element
  private val p1 = pow(B1, k - 1, M1)
  private val p2 = pow(B2, k - 1, M2)

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "poly_grams"

  override protected def nullSafeEval(a: Any): Any = {
    val hs = a.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    var a1 = 0L
    var a2 = 0L
    var i = 0
    while (i < k) {
      val h = hs.getLong(i)
      a1 = (a1 * B1 + h % M1) % M1
      a2 = (a2 * B2 + h % M2) % M2
      i += 1
    }
    out(0) = a1 * 2147483648L + a2
    var s = 1
    while (s <= n - k) {
      val hOut = hs.getLong(s - 1)
      val hIn = hs.getLong(s + k - 1)
      a1 = (((a1 - hOut % M1 * p1 % M1) % M1 + M1) % M1 * B1 + hIn % M1) % M1
      a2 = (((a2 - hOut % M2 * p2 % M2) % M2 + M2) % M2 * B2 + hIn % M2) % M2
      out(s) = a1 * 2147483648L + a2
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val a1 = ctx.freshName("a1"); val a2 = ctx.freshName("a2")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val h = ctx.freshName("h"); val hOut = ctx.freshName("hOut")
      val hIn = ctx.freshName("hIn")
      s"""
         |int $n = $hs.numElements();
         |long[] $out = new long[$n < $k ? 0 : $n - $k + 1];
         |if ($n >= $k) {
         |  long $a1 = 0L; long $a2 = 0L;
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $h = $hs.getLong($i);
         |    $a1 = ($a1 * ${B1}L + $h % ${M1}L) % ${M1}L;
         |    $a2 = ($a2 * ${B2}L + $h % ${M2}L) % ${M2}L;
         |  }
         |  $out[0] = $a1 * 2147483648L + $a2;
         |  for (int $s = 1; $s <= $n - $k; $s++) {
         |    long $hOut = $hs.getLong($s - 1);
         |    long $hIn = $hs.getLong($s + $k - 1);
         |    $a1 = ((($a1 - $hOut % ${M1}L * ${p1}L % ${M1}L) % ${M1}L + ${M1}L) % ${M1}L * ${B1}L + $hIn % ${M1}L) % ${M1}L;
         |    $a2 = ((($a2 - $hOut % ${M2}L * ${p2}L % ${M2}L) % ${M2}L + ${M2}L) % ${M2}L * ${B2}L + $hIn % ${M2}L) % ${M2}L;
         |    $out[$s] = $a1 * 2147483648L + $a2;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PolyGrams =
    copy(child = c)
}

/**
 * `ascii_poly_grams(s)`: [[PolyGrams]] run DIRECTLY over a string's
 * bytes — value-identical to `PolyGrams(transform(split(s, ''), c ->
 * ascii(c)), k)` for ASCII input, without ever materializing the
 * per-character string array and code array (three O(n) allocations
 * per row that dominated char-level span dedup at the 1 M-doc probe).
 *
 * PRECONDITION: ASCII-only input (char-span dedup feeds `[a-z0-9]*` by
 * construction). Non-ASCII bytes still hash deterministically (masked
 * to 0..255, non-negative) but per BYTE, which diverges from the
 * per-CHARACTER `ascii()` spelling the oracle uses.
 */
case class AsciiPolyGrams(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(k >= 1)
  import PolyGrams._
  private val p1 = pow(B1, k - 1, M1)
  private val p2 = pow(B2, k - 1, M2)

  override def inputTypes: Seq[DataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ascii_poly_grams"

  override protected def nullSafeEval(a: Any): Any = {
    val str = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val n = str.numBytes()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    var a1 = 0L
    var a2 = 0L
    var i = 0
    while (i < k) {
      val h = (str.getByte(i) & 0xFF).toLong
      a1 = (a1 * B1 + h % M1) % M1
      a2 = (a2 * B2 + h % M2) % M2
      i += 1
    }
    out(0) = a1 * 2147483648L + a2
    var s = 1
    while (s <= n - k) {
      val hOut = (str.getByte(s - 1) & 0xFF).toLong
      val hIn = (str.getByte(s + k - 1) & 0xFF).toLong
      a1 = (((a1 - hOut % M1 * p1 % M1) % M1 + M1) % M1 * B1 + hIn % M1) % M1
      a2 = (((a2 - hOut % M2 * p2 % M2) % M2 + M2) % M2 * B2 + hIn % M2) % M2
      out(s) = a1 * 2147483648L + a2
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val a1 = ctx.freshName("a1"); val a2 = ctx.freshName("a2")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val h = ctx.freshName("h"); val hOut = ctx.freshName("hOut")
      val hIn = ctx.freshName("hIn")
      s"""
         |int $n = $str.numBytes();
         |long[] $out = new long[$n < $k ? 0 : $n - $k + 1];
         |if ($n >= $k) {
         |  long $a1 = 0L; long $a2 = 0L;
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $h = (long) ($str.getByte($i) & 0xFF);
         |    $a1 = ($a1 * ${B1}L + $h % ${M1}L) % ${M1}L;
         |    $a2 = ($a2 * ${B2}L + $h % ${M2}L) % ${M2}L;
         |  }
         |  $out[0] = $a1 * 2147483648L + $a2;
         |  for (int $s = 1; $s <= $n - $k; $s++) {
         |    long $hOut = (long) ($str.getByte($s - 1) & 0xFF);
         |    long $hIn = (long) ($str.getByte($s + $k - 1) & 0xFF);
         |    $a1 = ((($a1 - $hOut % ${M1}L * ${p1}L % ${M1}L) % ${M1}L + ${M1}L) % ${M1}L * ${B1}L + $hIn % ${M1}L) % ${M1}L;
         |    $a2 = ((($a2 - $hOut % ${M2}L * ${p2}L % ${M2}L) % ${M2}L + ${M2}L) % ${M2}L * ${B2}L + $hIn % ${M2}L) % ${M2}L;
         |    $out[$s] = $a1 * 2147483648L + $a2;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): AsciiPolyGrams =
    copy(child = c)
}

/**
 * `window_minima(ghs)`: the DISTINCT sliding-window minima of `w`
 * consecutive entries of a BIGINT array — winnowing's fingerprint
 * selection (Schleimer et al. 2003, MOSS) fused into one pass.
 * Value-identical (ordering included: first occurrence wins, like
 * `array_distinct`) to the relational spelling the DuckDB oracles keep,
 * `array_distinct(transform(sequence(0, size(ghs)-w), j ->
 * least(ghs[j], …, ghs[j+w-1])))`, but computed with a monotonic deque
 * (O(n) total instead of O(n·w) ladder evaluations) and an
 * open-addressed long set for the dedup — no n-length minima array, no
 * interpreted per-element lambda (Catalyst higher-order functions don't
 * codegen; the `transform` ladder was the measured cost center of the
 * winnow prefilter at the r15 bench), no second `array_distinct` pass.
 * Empty output when the input holds fewer than `w` entries.
 */
case class WindowMinima(child: Expression, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(w >= 1)

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "window_minima"

  override protected def nullSafeEval(a: Any): Any =
    WindowMinima.compute(a.asInstanceOf[ArrayData], w)

  // one static-kernel call per row — the loop itself is branchy (deque
  // + probe table), so inlining it into the generated source would only
  // bloat the method past the JIT budget; the kernel stays shared with
  // the interpreted path and the row never leaves WholeStageCodegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.WindowMinima.compute($arr, $w);")

  override protected def withNewChildInternal(c: Expression): WindowMinima =
    copy(child = c)
}

object WindowMinima {
  /** Distinct window-of-`w` minima of `arr`, first-occurrence order.
    * Monotonic deque over indices (each index enters and leaves once);
    * dedup via open addressing at load factor ≤ 0.5 (capacity is the
    * next power of two ≥ 2·windows, so probes terminate). */
  def compute(arr: ArrayData, w: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val windows = n - w + 1
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // live indices in [head, tail)
    val cap = java.lang.Integer.highestOneBit(math.max(4, 2 * windows - 1)) << 1
    val mask = cap - 1
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Long](windows)
    var outN = 0
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      while (tail > head && arr.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val mn = arr.getLong(deque(head))
        var slot = (java.lang.Long.hashCode(mn) * -1640531527) & mask
        var fresh = false
        var probing = true
        while (probing) {
          if (!used(slot)) { used(slot) = true; keys(slot) = mn; fresh = true; probing = false }
          else if (keys(slot) == mn) probing = false
          else slot = (slot + 1) & mask
        }
        if (fresh) { out(outN) = mn; outN += 1 }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outN))
  }
}

/**
 * `pq_assign(v)`: product-quantization encoding fused into ONE codegen
 * expression — for each of `m` contiguous subspaces of `dim` components
 * the L2-nearest codebook entry (argmax `2·dot − |c|²` over `nCodes`
 * entries, ties to the LOWEST code via strict-greater), returning the
 * `m` codes as `array<int>`. `books` is the flattened
 * `m × nCodes × dim` codebook matrix; squared norms are precomputed
 * once per operator. Replaces `m × nCodes` separate dot/slice
 * expression nodes — the same plan-bloat fix [[HyperplaneBuckets]]
 * applies to LSH (the unfused spelling ran ~30× slower at sf0.1).
 */
case class PqAssign(child: Expression, books: Array[Long],
                    m: Int, nCodes: Int, dim: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(books.length == m * nCodes * dim && m >= 1 && nCodes >= 1)

  private lazy val norms: Array[Long] = Array.tabulate(m * nCodes) { mc =>
    var acc = 0L
    var i = 0
    while (i < dim) { val x = books(mc * dim + i); acc += x * x; i += 1 }
    acc
  }

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_assign"

  override protected def nullSafeEval(vAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    // UnsafeArrayData accessors are unchecked: a wrong-dimension vector
    // would yield silent garbage codes, not an error
    if (v.numElements() != m * dim) throw new IllegalArgumentException(
      s"pq_assign: vector has ${v.numElements()} components, expected ${m * dim}")
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestScore = Long.MinValue
      var c = 0
      while (c < nCodes) {
        val mc = s * nCodes + c
        var acc = 0L
        var i = 0
        while (i < dim) { acc += v.getLong(s * dim + i) * books(mc * dim + i); i += 1 }
        val score = 2 * acc - norms(mc)
        if (score > bestScore) { bestScore = score; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("books", books, "long[]")
    val normsRef = ctx.addReferenceObj("norms", norms, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out"); val s = ctx.freshName("s")
      val best = ctx.freshName("best"); val bestScore = ctx.freshName("bestScore")
      val c = ctx.freshName("c"); val mc = ctx.freshName("mc")
      val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
      val score = ctx.freshName("score")
      s"""
         |if ($v.numElements() != ${m * dim}) {
         |  throw new IllegalArgumentException("pq_assign: vector has " +
         |    $v.numElements() + " components, expected ${m * dim}");
         |}
         |int[] $out = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $best = 0;
         |  long $bestScore = java.lang.Long.MIN_VALUE;
         |  for (int $c = 0; $c < $nCodes; $c++) {
         |    int $mc = $s * $nCodes + $c;
         |    long $acc = 0L;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $acc += $v.getLong($s * $dim + $i) * $booksRef[$mc * $dim + $i];
         |    }
         |    long $score = 2L * $acc - $normsRef[$mc];
         |    if ($score > $bestScore) { $bestScore = $score; $best = $c; }
         |  }
         |  $out[$s] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): PqAssign =
    copy(child = c)
}

/**
 * `pq_query_table(v)`: the per-query ADC partial-dot table, fused —
 * entry `s·nCodes + c` is `dot(v_s, books[s][c])`, returned as one
 * `array<long>` of `m × nCodes` entries (posexplode downstream gives
 * the `(sub, code, pdot)` rows the ADC join consumes). Same flattened
 * codebook layout as [[PqAssign]].
 */
case class PqQueryTable(child: Expression, books: Array[Long],
                        m: Int, nCodes: Int, dim: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(books.length == m * nCodes * dim && m >= 1 && nCodes >= 1)

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_query_table"

  override protected def nullSafeEval(vAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    if (v.numElements() != m * dim) throw new IllegalArgumentException(
      s"pq_query_table: vector has ${v.numElements()} components, expected ${m * dim}")
    val out = new Array[Long](m * nCodes)
    var mc = 0
    while (mc < m * nCodes) {
      val s = mc / nCodes
      var acc = 0L
      var i = 0
      while (i < dim) { acc += v.getLong(s * dim + i) * books(mc * dim + i); i += 1 }
      out(mc) = acc
      mc += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("books", books, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out"); val mc = ctx.freshName("mc")
      val s = ctx.freshName("s"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |if ($v.numElements() != ${m * dim}) {
         |  throw new IllegalArgumentException("pq_query_table: vector has " +
         |    $v.numElements() + " components, expected ${m * dim}");
         |}
         |long[] $out = new long[${m * nCodes}];
         |for (int $mc = 0; $mc < ${m * nCodes}; $mc++) {
         |  int $s = $mc / $nCodes;
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $acc += $v.getLong($s * $dim + $i) * $booksRef[$mc * $dim + $i];
         |  }
         |  $out[$mc] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): PqQueryTable =
    copy(child = c)
}

/** Constants of the double 31-bit polynomial gram hash — the single
  * source of truth consumed by [[PolyGrams]], by
  * [[graft.operators.Dedup.spanGramHash]]'s SQL spelling, and therefore
  * by the DuckDB oracles. */
object PolyGrams {
  val M1 = 2147483647L // 2^31 - 1, prime
  val M2 = 2147483629L // prime
  val B1 = 1000003L
  val B2 = 1000033L

  /** b^e mod m by square-and-multiply (all operands < 2^31, so every
    * product stays under 2^62 — exact in 64-bit). */
  def pow(b: Long, e: Int, m: Long): Long = {
    var result = 1L
    var base = b % m
    var exp = e
    while (exp > 0) {
      if ((exp & 1) == 1) result = result * base % m
      base = base * base % m
      exp >>= 1
    }
    result
  }
}

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

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * `sorted_floor(keys, probe)`: the greatest element of the SORTED BIGINT
 * array `keys` that is ≤ `probe`, or NULL when every element exceeds the
 * probe — the reference's `getRowOrBefore` as-of lookup
 * (`Index.java:115-122`) as a native expression: the (metadata-scale)
 * key array rides the plan as a literal and each probe binary-searches
 * inside generated code. Replaces a Scala UDF, so as-of routing stays
 * inside WholeStageCodegen.
 */
case class SortedFloor(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // probe below the smallest key
  override def prettyName: String = "sorted_floor"

  override protected def nullSafeEval(keysAny: Any, probeAny: Any): Any = {
    val keys = keysAny.asInstanceOf[ArrayData]
    val probe = probeAny.asInstanceOf[Long]
    var lo = 0
    var hi = keys.numElements() - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (keys.getLong(mid) <= probe) { ans = mid; lo = mid + 1 } else hi = mid - 1
    }
    if (ans < 0) null else keys.getLong(ans)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (keys, probe) => {
      val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid"); val ans = ctx.freshName("ans")
      s"""
         |int $lo = 0;
         |int $hi = $keys.numElements() - 1;
         |int $ans = -1;
         |while ($lo <= $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($keys.getLong($mid) <= $probe) { $ans = $mid; $lo = $mid + 1; }
         |  else { $hi = $mid - 1; }
         |}
         |if ($ans < 0) { ${ev.isNull} = true; } else { ${ev.value} = $keys.getLong($ans); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedFloor =
    copy(left = newLeft, right = newRight)
}

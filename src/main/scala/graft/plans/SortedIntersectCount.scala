package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Count of common elements between two ascending-sorted `ARRAY<BIGINT>`
  * columns, by primitive two-pointer merge.
  *
  * The composable form — `size(array_intersect(a, b))` — builds a boxed
  * hash set per row and materializes the intersection array only to take
  * its length; on the similarity-join verify stage (hundreds of thousands
  * of candidate pairs × ~50-element shingle arrays) that allocation
  * dominates. This expression emits a branch-light merge loop inside
  * whole-stage codegen: no set, no output array, primitive `long` loads.
  *
  * Set semantics match `array_intersect` when both inputs are duplicate-
  * free (ours are: they come from `array_distinct`/`collect_set`); with
  * duplicates, a run of equal values counts once per side-pair minimum —
  * callers must dedup first, which the sorted-input precondition already
  * implies in every graft call site. Null elements sort first under
  * `sort_array` and are skipped (a null matches nothing), mirroring
  * `array_intersect`. Inputs NOT sorted ascending give undefined counts —
  * the caller owns the sort, typically one `sort_array` per document, not
  * per pair.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_sorted_intersect"

  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    if (elementsNullable) {
      while (i < n && x.isNullAt(i)) i += 1
      while (j < m && y.isNullAt(j)) j += 1
    }
    while (i < n && j < m) {
      val xi = x.getLong(i)
      val yj = y.getLong(j)
      if (xi < yj) i += 1
      else if (xi > yj) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      val nullSkip =
        if (elementsNullable)
          s"""while ($i < $n && $a.isNullAt($i)) $i++;
             |while ($j < $m && $b.isNullAt($j)) $j++;""".stripMargin
        else ""
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |$nullSkip
         |while ($i < $n && $j < $m) {
         |  long $xi = $a.getLong($i);
         |  long $yj = $b.getLong($j);
         |  if ($xi < $yj) $i++;
         |  else if ($xi > $yj) $j++;
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

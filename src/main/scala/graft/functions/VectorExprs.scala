package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd integer dot product over two Array[Long] columns —
  * the one place the similarity family outgrows built-ins (SURVEY.md
  * §7.4): the higher-order `aggregate(zip_with(a, b, *), 0, +)` form is
  * evaluated *interpreted* (lambda expressions don't participate in
  * whole-stage codegen and allocate a zipped intermediate array per row),
  * while this expression compiles to a tight primitive loop inside the
  * generated code. Preference order per the build brief: compose
  * built-ins (done everywhere else) → custom codegen Expression (here) →
  * UDF (nowhere).
  *
  * Null semantics: null if either array is null (BinaryExpression's
  * null-safe path); array *elements* are assumed non-null, which the
  * integer-scaling producer (`Similarity.scaled`) guarantees.
  */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_long expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Register `dot_long` in the session's function registry (idempotent)
    * so plain SQL/expr strings can call it. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registry.createOrReplaceTempFunction("dot_long",
      (args: Seq[Expression]) => DotProductLong(args(0), args(1)), "built-in")
    registry.createOrReplaceTempFunction("sorted_intersect_count",
      (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1)), "built-in")
  }
}

/** The public injection point for graft's native expressions: build the
  * session with `.withExtensions(new GraftExtensions)` or set
  * `spark.sql.extensions=graft.functions.GraftExtensions` — the supported
  * `SparkSessionExtensions` path for adding catalyst functions to every
  * session of a deployment (the runtime `VectorExprs.register` covers
  * sessions graft didn't build). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_long"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProductLong].getName, "dot_long"),
      (args: Seq[Expression]) => DotProductLong(args(0), args(1))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("sorted_intersect_count"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))))
    // whole-operator extension: the as-of join planner strategy
    // (graft.plans.AsOfJoin → AsOfJoinExec) plus its filter-pushdown
    // optimizer rule (Catalyst can't push through an unknown node)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
  }
}

package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** All ordered pairs (a, b), a-index < b-index, of a long array — the
  * in-group pair-expansion core of the dedup family (q45 rare-shingle
  * Jaccard, q46 LSH buckets, and their q81/q97/q119/q120 consumers).
  *
  * One compiled loop emits exactly C(n,2) structs; the declarative
  * equivalent (two `posexplode`s + `pj > pi` filter) materializes n² rows
  * and discards over half, and its second Generate re-evaluates against
  * every intermediate row. Consumed as `inline(ordered_pairs(ids))`, so
  * the Generate node is the codegen-capable `Inline` and the only
  * interpreted island is this expression's own tight loop.
  *
  * Callers bound n (df / band-bucket caps ≤ 256), so the quadratic
  * expansion is capped per group by construction — the same contract the
  * posexplode form relied on.
  */
case class OrderedPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_ordered_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ordered_pairs expects array<bigint>, got ${other.simpleString(10)}")
  }

  override def nullSafeEval(input: Any): Any = {
    val ids = input.asInstanceOf[ArrayData]
    val total = ids.numElements()
    // null ELEMENTS are skipped (the type-check admits containsNull
    // arrays — collect_list over a nullable column types that way even
    // though it drops nulls — and getLong on a null slot would crash)
    val vals = new Array[Long](total)
    var n = 0
    var t = 0
    while (t < total) {
      if (!ids.isNullAt(t)) { vals(n) = ids.getLong(t); n += 1 }
      t += 1
    }
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = vals(i)
      var j = i + 1
      while (j < n) {
        val row = new GenericInternalRow(2)
        row.setLong(0, a)
        row.setLong(1, vals(j))
        out(k) = row.asInstanceOf[InternalRow]
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): OrderedPairs =
    copy(child = newChild)
}

object OrderedPairs {
  private val FnName = "graft_ordered_pairs"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => OrderedPairs(exprs.head), "built-in")

  /** Column API: requires register(spark) once per session. */
  def orderedPairs(ids: Column): Column = call_function(FnName, ids)
}

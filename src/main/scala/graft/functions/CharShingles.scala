package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character n-gram shingles as a native expression.
  *
  * Semantically identical to the declarative
  * `transform(sequence(1, greatest(len-n+1, 1)), i -> substr(text, i, n))`
  * (TextOps.charShinglesHof) — including the texts-shorter-than-n case
  * (one truncated shingle) and SQL character (not byte) semantics via
  * substringSQL. The HOF version is interpreted per element and
  * dominated MinHash runtime (4.3s of a 16s query at sf0.1 just building
  * shingles); this is one generated loop.
  */
case class CharShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0)

  override def prettyName: String = "char_shingles"

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_shingles expects a string column, got ${child.dataType.simpleString}")

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val count = math.max(s.numChars() - n + 1, 1)
    val arr = new Array[AnyRef](count)
    var i = 0
    while (i < count) {
      arr(i) = s.substringSQL(i + 1, n)
      i += 1
    }
    new GenericArrayData(arr)
  }

  // freshName for every local: a second char_shingles in the same
  // codegen scope would redeclare fixed names and Janino's
  // "Redefinition of local variable" drops the stage to interpreted
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val count = ctx.freshName("count")
      val arr = ctx.freshName("arr")
      val i = ctx.freshName("i")
      s"""
         |int $count = java.lang.Math.max($c.numChars() - ${n - 1}, 1);
         |UTF8String[] $arr = new UTF8String[$count];
         |for (int $i = 0; $i < $count; $i++) {
         |  $arr[$i] = $c.substringSQL($i + 1, $n);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

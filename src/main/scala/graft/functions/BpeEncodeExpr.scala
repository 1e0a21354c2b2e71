package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE encode: string → array<int> token ids under a deployed
  * [[graft.llm.Bpe.BpeModel]] (greedy min-rank leftmost merges — the
  * exact spec on the Bpe scaladoc). The merge loop is irregular control
  * flow, so instead of inlining generated Java the codegen path calls
  * back into [[encodeToArrayData]] through a reference object — this
  * KEEPS the operator inside whole-stage codegen (no CodegenFallback
  * row materialization; the same technique Spark uses for regexp and
  * json expressions whose kernels live in library classes).
  */
case class BpeEncodeExpr(child: Expression, model: graft.llm.Bpe.BpeModel)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bpe_encode"
  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)

  def encodeToArrayData(input: UTF8String): GenericArrayData =
    new GenericArrayData(graft.llm.Bpe.encodeString(input.toString, model))

  override def nullSafeEval(input: Any): Any =
    encodeToArrayData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeExpr", this, classOf[BpeEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encodeToArrayData($c);")
  }
}

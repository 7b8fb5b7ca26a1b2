// Hosted under org.apache.spark.sql so the expressions can use the
// private[sql] ExpectsInputTypes/AbstractDataType machinery like any
// built-in; the public kernels live here too for codegen call targets.
package org.apache.spark.sql.graftexpr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level kernels for the native expressions: operate directly on
  * UTF8String so whole-stage codegen calls them without converting to
  * java.lang.String (the Scala-UDF path pays that conversion per row).
  */
object SeqOpsBytes {
  /** True when every byte is single-byte UTF-8 (ASCII) — the hot-path
    * precondition for operating on raw bytes.
    */
  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) { if ((s.getByte(i) & 0x80) != 0) return false; i += 1 }
    true
  }

  def gcContent(s: UTF8String): Float = {
    if (!isAscii(s)) // denominator must be CHARS, not bytes
      return graft.functions.SeqOps.gcContent(s.toString).toFloat
    val n = s.numBytes()
    var gc = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b == 'G' || b == 'C') gc += 1
      i += 1
    }
    gc.toFloat / n.toFloat
  }

  def reverseComplement(s: UTF8String): UTF8String = {
    if (!isAscii(s)) // byte reversal would shred multi-byte characters
      return UTF8String.fromString(
        graft.functions.SeqOps.reverseComplement(s.toString))
    val in = s.getBytes
    val n = in.length
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(n - 1 - i) = (in(i): @annotation.switch) match {
        case 'A' => 'T'; case 'a' => 't'
        case 'T' => 'A'; case 't' => 'a'
        case 'C' => 'G'; case 'c' => 'g'
        case 'G' => 'C'; case 'g' => 'c'
        case b => b
      }
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def cosine(a: org.apache.spark.sql.catalyst.util.ArrayData,
             b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      // ArrayData.getFloat on a null slot silently yields 0.0f — a null
      // element is a data bug, so fail loudly instead of skewing scores
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"cosine_similarity: null element at index $i")
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  def dotLong(a: org.apache.spark.sql.catalyst.util.ArrayData,
              b: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      // same loud-null policy as cosine: getLong on a null slot yields 0
      // silently, which would skew scores instead of surfacing the bug
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"dot_long: null element at index $i")
      dot += a.getLong(i) * b.getLong(i)
      i += 1
    }
    dot
  }

  def sqDistLong(a: org.apache.spark.sql.catalyst.util.ArrayData,
                 b: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"sqdist_long: null element at index $i")
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  def qualityScoresToList(s: UTF8String): GenericArrayData = {
    val in = s.getBytes
    val out = new Array[Any](in.length)
    var i = 0
    while (i < in.length) { out(i) = (in(i) & 0xff) - 33; i += 1 }
    new GenericArrayData(out)
  }
}

abstract class GraftUnaryExpression extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  /** Fully-qualified static call target, e.g. "...SeqOpsBytes.gcContent". */
  def kernel: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kernel($c)")
}

/** gc_content as a codegen'd expression (fraction of uppercase G/C bytes). */
case class GcContentExpr(child: Expression) extends GraftUnaryExpression {
  override def dataType: DataType = FloatType
  override def kernel: String = "org.apache.spark.sql.graftexpr.SeqOpsBytes.gcContent"
  override protected def nullSafeEval(input: Any): Any =
    SeqOpsBytes.gcContent(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** reverse_complement as a codegen'd expression (byte-wise, case preserving). */
case class ReverseComplementExpr(child: Expression) extends GraftUnaryExpression {
  override def dataType: DataType = StringType
  override def kernel: String = "org.apache.spark.sql.graftexpr.SeqOpsBytes.reverseComplement"
  override protected def nullSafeEval(input: Any): Any =
    SeqOpsBytes.reverseComplement(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** quality_scores_to_list as a codegen'd expression (Phred+33 decode). */
case class QualityScoresToListExpr(child: Expression) extends GraftUnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def kernel: String = "org.apache.spark.sql.graftexpr.SeqOpsBytes.qualityScoresToList"
  override protected def nullSafeEval(input: Any): Any =
    SeqOpsBytes.qualityScoresToList(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** cosine_similarity as a codegen'd binary expression over float arrays —
  * reads ArrayData in place (no Seq[Float] conversion per row), which is the
  * hot loop of the ANN / embedding-near-dup queries.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SeqOpsBytes.cosine(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graftexpr.SeqOpsBytes.cosine($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot_long: integer dot product over two ARRAY<BIGINT>, codegen'd — the
  * per-pair hot loop of the quantized-grid dedup/PQ queries (l25's
  * within-cluster prune evaluates it millions of times; the zip_with +
  * aggregate formulation it replaces allocates an intermediate array per
  * pair).
  */
case class DotLongExpr(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SeqOpsBytes.dotLong(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graftexpr.SeqOpsBytes.dotLong($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** sqdist_long: integer squared-L2 over two ARRAY<BIGINT>, codegen'd —
  * the per-(vec, subspace) hot loop of the PQ codebook queries.
  */
case class SqDistLongExpr(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SeqOpsBytes.sqDistLong(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graftexpr.SeqOpsBytes.sqDistLong($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native mergeable MinHash aggregate: `minhash_agg(shingle)` folds each
  * input string into a 64-perm signature buffer (columnwise min), with
  * partial aggregation + executor-side merge like any built-in — ONE
  * aggregation pass replaces the explode-64-positions + groupBy-min plan
  * (64× less shuffle input for the same signature). Duplicate shingles
  * are absorbed by min, so inputs need no pre-distinct. Identical math
  * to `TextOps.minhashSignature` (asserted by MinHashAggSpec), so
  * signatures interoperate with every existing MinHash consumer.
  */
case class MinHashAggExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(graft.functions.TextOps.NumHashes)(Long.MaxValue)

  override def update(buffer: Array[Long],
                      input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      graft.functions.TextOps.minhashUpdateInPlace(
        buffer, v.asInstanceOf[UTF8String].toString)
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAggExpr =
    copy(child = newChild)
}

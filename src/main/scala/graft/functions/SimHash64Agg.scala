package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass mergeable 64-bit SimHash aggregate.
  *
  * Input: one 64-hex-char token-hash string per row (e.g.
  * `concat(md5('0:'||tok), md5('1:'||tok))`). Bit i of the result is the
  * sign of the vote sum over rows, where hex char i votes +1 if its
  * value is odd, −1 if even (ties → 0). Declaratively this is 64
  * `sum(CASE …)` columns and a 64-term bit assembly (that exact SQL is
  * the DuckDB oracle for d7); as a `TypedImperativeAggregate` the buffer
  * is one int[64], updated in a single pass and merged associatively —
  * the shape that matters when the group-by carries billions of tokens:
  * partial states are 256 bytes regardless of group size.
  */
case class SimHash64Agg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  private val Bits = 64

  override def createAggregationBuffer(): Array[Int] = new Array[Int](Bits)

  override def update(b: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      val n = math.min(Bits, s.length)
      var i = 0
      while (i < n) {
        val d = Character.digit(s.charAt(i), 16)
        b(i) += (if ((d & 1) == 1) 1 else -1)
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Int], o: Array[Int]): Array[Int] = {
    var i = 0
    while (i < Bits) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Int]): Any = {
    var h = 0L
    var i = 0
    while (i < Bits) {
      if (b(i) > 0) h |= (1L << i)
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override def serialize(b: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(Bits * 4)
    b.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(Bits)(bb.getInt())
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "simhash64"

  override def withNewMutableAggBufferOffset(offset: Int): SimHash64Agg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimHash64Agg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHash64Agg =
    copy(child = newChildren.head)
}

object SimHash64Agg {
  /** Column-API form: `simhash64(hashCol)` as an aggregate expression. */
  def simhash64(c: Column): Column =
    Bridge.column(SimHash64Agg(Bridge.expr(c)).toAggregateExpression())
}

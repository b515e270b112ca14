package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter summary as a native aggregate: at most `k`
  * counters, O(k) memory per partial buffer, mergeable (counter-wise add,
  * then subtract the (k+1)-th largest count and drop non-positive — the
  * Agarwal/Cormode/Huang/Phillips/Wei/Yi mergeable-summaries rule), so the
  * combined error stays <= N/(k+1) across any merge tree.
  *
  * GUARANTEE USED BY CALLERS: every item with true frequency > N/(k+1)
  * SURVIVES in the final summary. The summary is therefore a candidate
  * PRUNER, not an answer: a second exact pass counts only the <= k
  * surviving candidates (a broadcast semi-join at any scale) and applies
  * the real threshold — the result is provably exact while the full-stream
  * state stays O(k) per partition, the property that matters when the key
  * domain is 10^9 at 100 TB.
  *
  * eval returns the surviving items sorted (count desc, item asc) — the
  * estimated counts are partition-order-dependent (as in any MG), so
  * callers must not ship them as answers; the exact pass does.
  */
case class MisraGriesSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"capacity must be >= 1, got $k")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString // copy out of the reused UTF8String buffer
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item, 1L)
        case None => // decrement-all: the classic MG step, O(k)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (i, c) => if (c <= 0) dead += i }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (i, c) => a.update(i, a.getOrElse(i, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from every counter, drop <= 0:
      // keeps exactly <= k counters and adds <= that value of error
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - sub)
      a.foreach { case (i, c) => if (c <= 0) dead += i }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val items = buf.toArray.sortBy { case (i, c) => (-c, i) }
    new GenericArrayData(items.map { case (i, _) => UTF8String.fromString(i) })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, c) =>
      val bytes = i.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_heavy_hitters"

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesSketch =
    copy(child = newChild)
}

object MisraGries {
  /** Aggregate Column: the <= k surviving heavy-hitter CANDIDATES (strings)
    * of the group — pair with an exact count of the survivors to get a
    * provably exact over-threshold answer.
    */
  def sketch(c: Column, k: Int): Column =
    GraftExpressionBridge.column(
      MisraGriesSketch(GraftExpressionBridge.expression(c), k).toAggregateExpression())
}

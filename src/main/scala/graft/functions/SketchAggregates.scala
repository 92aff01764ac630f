package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native Catalyst aggregate —
  * the engine's first `TypedImperativeAggregate`, for "top sellers /
  * dominant tokens / hot keys per group" questions where the per-group
  * key domain is unbounded but only the frequent tail matters.
  *
  * Guarantees (Misra & Gries 1982; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS'12): with capacity k over a group of N
  * rows, every reported count c satisfies
  * `true − N/(k+1) <= c <= true`, and ANY item with true frequency
  * `> N/(k+1)` is guaranteed present. When k >= the group's distinct
  * key count no decrement ever fires — in any partition or any merge
  * order — so the sketch is EXACT and partitioning-invariant, which is
  * what lets the oracled query hash-match DuckDB's exact GROUP BY.
  *
  * Scale shape (100 TB): state is a bounded k-entry map per group —
  * partial aggregation runs map-side (ObjectHashAggregate), merges are
  * associative/commutative within the stated bound, and the shuffle
  * carries k counters per group instead of the full key domain. That is
  * the whole point versus exact `groupBy(key).count`: the exchange is
  * O(groups × k), independent of domain cardinality. Reference surfaces
  * its top-N via full count + window (stats/listening_activity.py et
  * al.) — this is the bounded-state path those queries graduate to when
  * the key domain no longer fits a shuffle.
  *
  * Output: `array<struct<item, count>>` sorted by (count desc, item
  * asc) — deterministic, so `slice(.., 1, n)` IS the top-n.
  */
case class MisraGriesAgg(
    child: Expression,
    capacityExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Any, Long]] {

  private lazy val isString = child.dataType.isInstanceOf[StringType]

  lazy val capacity: Int = capacityExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, capacityExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!child.dataType.isInstanceOf[StringType] &&
        child.dataType != LongType && child.dataType != IntegerType)
      return TypeCheckResult.TypeCheckFailure(
        s"item must be string/bigint/int, got ${child.dataType}")
    if (!capacityExpr.foldable ||
        !Seq(IntegerType, LongType).contains(capacityExpr.dataType))
      return TypeCheckResult.TypeCheckFailure("capacity must be an " +
        s"integer literal, got ${capacityExpr.dataType}")
    if (capacityExpr.eval() == null ||
        capacityExpr.eval().asInstanceOf[Number].longValue() < 1 ||
        capacityExpr.eval().asInstanceOf[Number].longValue() > 4000000)
      return TypeCheckResult.TypeCheckFailure(
        "capacity must be in [1, 4e6]")
    TypeCheckResult.TypeCheckSuccess
  }

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", child.dataType, nullable = false),
    StructField("count", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[Any, Long],
      input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val cur = buf.getOrElse(v, 0L)
      if (cur > 0L) buf(v) = cur + 1L
      else if (buf.size < capacity) {
        // UTF8String from an unsafe row points into a reused buffer —
        // copy on first insert (lookups compare by content, no copy)
        val key = v match {
          case s: UTF8String => s.copy()
          case i: Integer    => i
          case other         => other
        }
        buf(key) = 1L
      } else {
        // classic MG step: unseen item at capacity decrements every
        // counter (the incoming item is absorbed by the decrement)
        val dead = mutable.ArrayBuffer.empty[Any]
        buf.mapValuesInPlace((_, c) => c - 1L)
        buf.foreach { case (k, c) => if (c <= 0L) dead += k }
        dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      b1: mutable.HashMap[Any, Long],
      b2: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    b2.foreach { case (k, c) => b1(k) = b1.getOrElse(k, 0L) + c }
    if (b1.size > capacity) {
      // subtract the (capacity+1)-th largest counter from all — the
      // mergeable-summaries trim that preserves the N/(k+1) error bound
      val vals = b1.values.toArray
      java.util.Arrays.sort(vals)
      val m = vals(vals.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[Any]
      b1.mapValuesInPlace((_, c) => c - m)
      b1.foreach { case (k, c) => if (c <= 0L) dead += k }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    val entries = buf.toArray
    val sorted = entries.sortWith { case ((k1, c1), (k2, c2)) =>
      if (c1 != c2) c1 > c2
      else if (isString)
        k1.asInstanceOf[UTF8String].compareTo(k2.asInstanceOf[UTF8String]) < 0
      else k1.asInstanceOf[Number].longValue() <
        k2.asInstanceOf[Number].longValue()
    }
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(k, c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      if (isString) {
        val bytes = k.asInstanceOf[UTF8String].getBytes
        out.writeInt(bytes.length)
        out.write(bytes)
      } else out.writeLong(k.asInstanceOf[Number].longValue())
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Any, Long]
    var i = 0
    while (i < n) {
      val key: Any =
        if (isString) {
          val len = in.readInt()
          val b = new Array[Byte](len)
          in.readFully(b)
          UTF8String.fromBytes(b)
        } else if (child.dataType == IntegerType)
          Integer.valueOf(in.readLong().toInt)
        else java.lang.Long.valueOf(in.readLong())
      buf(key) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(
      newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), capacityExpr = newChildren(1))

  override def prettyName: String = "graft_heavy_hitters"
}

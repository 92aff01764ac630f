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

/** Exact bounded-state per-group top-k (or bottom-k) as a native
  * Catalyst aggregate: keeps the k best `(weight, item)` pairs per
  * group in an O(k) ordered buffer. Unlike Misra–Gries this is EXACT
  * for every k — top-k of a union is the top-k of the per-partition
  * top-ks — so the result is partitioning-invariant by construction.
  *
  * This is the aggregate form of the `Window.partitionBy(g)
  * .orderBy(w.desc) + row_number <= k` idiom (reference:
  * stats top-N queries, e.g. stats/user/entity.py's per-user top
  * artists). Spark's own WindowGroupLimit pushdown already trims the
  * rank-window exchange to ~k rows per group per map partition, but
  * only AFTER a full local sort of every input partition; this
  * aggregate reaches the same O(groups × k) exchange with an O(log k)
  * heap update per row under ObjectHashAggregate — no sort, no sort
  * buffer, and the map side combines groups hash-wise, so at 100 TB
  * the scan stays pipelined where the window form pays an
  * O(n log n) local sort per partition.
  *
  * Semantics: DISTINCT on the exact `(weight, item)` pair (a re-seen
  * identical pair does not occupy a second slot). That makes the same
  * aggregate double as a KMV/bottom-k sketch ([[graft.operators.Kmv]]):
  * feed `weight = xxhash64(item)` and the retained set is the k
  * minimum hash values — mergeable, bounded distinct-count /
  * set-overlap state. Total order: weight, then item (ascending item
  * breaks ties in BOTH directions), so output is deterministic.
  *
  * Output: `array<struct<item, weight>>` sorted best-first (weight
  * desc for top-k, asc for bottom-k; ties item asc) — `slice(.., 1, n)`
  * IS the top-n.
  */
case class BoundedTopKAgg(
    item: Expression,
    weight: Expression,
    kExpr: Expression,
    smallest: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Long, Any)]] {

  private lazy val isString = item.dataType.isInstanceOf[StringType]

  lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  // ascending = worst-first, so first() is the eviction candidate; the
  // comparator returns 0 only for an identical (weight, item) pair,
  // which is what gives the buffer its distinct-pair set semantics
  private def compareItems(a: Any, b: Any): Int =
    if (isString)
      a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    else java.lang.Long.compare(a.asInstanceOf[Number].longValue(),
      b.asInstanceOf[Number].longValue())

  private lazy val cmp: java.util.Comparator[(Long, Any)] =
    new java.util.Comparator[(Long, Any)] {
      override def compare(a: (Long, Any), b: (Long, Any)): Int = {
        val byW =
          if (smallest) java.lang.Long.compare(b._1, a._1)
          else java.lang.Long.compare(a._1, b._1)
        // larger item = worse in both directions (item asc wins ties)
        if (byW != 0) byW else compareItems(b._2, a._2)
      }
    }

  override def children: Seq[Expression] = Seq(item, weight, kExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!item.dataType.isInstanceOf[StringType] &&
        item.dataType != LongType && item.dataType != IntegerType)
      return TypeCheckResult.TypeCheckFailure(
        s"item must be string/bigint/int, got ${item.dataType}")
    if (weight.dataType != LongType && weight.dataType != IntegerType)
      return TypeCheckResult.TypeCheckFailure(
        s"weight must be bigint/int, got ${weight.dataType}")
    if (!kExpr.foldable ||
        !Seq(IntegerType, LongType).contains(kExpr.dataType))
      return TypeCheckResult.TypeCheckFailure(
        s"k must be an integer literal, got ${kExpr.dataType}")
    if (kExpr.eval() == null ||
        kExpr.eval().asInstanceOf[Number].longValue() < 1 ||
        kExpr.eval().asInstanceOf[Number].longValue() > 4000000)
      return TypeCheckResult.TypeCheckFailure("k must be in [1, 4e6]")
    TypeCheckResult.TypeCheckSuccess
  }

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", item.dataType, nullable = false),
    StructField("weight", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Any)] =
    new java.util.TreeSet[(Long, Any)](cmp)

  private def insert(
      buf: java.util.TreeSet[(Long, Any)], w: Long, v: Any): Unit = {
    val probe = (w, v)
    if (buf.size < k) {
      if (!buf.contains(probe)) {
        val key = v match {
          case s: UTF8String => s.copy()
          case other         => other
        }
        buf.add((w, key))
      }
    } else if (cmp.compare(probe, buf.first()) > 0 &&
        !buf.contains(probe)) {
      buf.pollFirst()
      val key = v match {
        case s: UTF8String => s.copy()
        case other         => other
      }
      buf.add((w, key))
    }
  }

  override def update(
      buf: java.util.TreeSet[(Long, Any)],
      input: InternalRow): java.util.TreeSet[(Long, Any)] = {
    val v = item.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null) insert(buf, w.asInstanceOf[Number].longValue(), v)
    buf
  }

  override def merge(
      b1: java.util.TreeSet[(Long, Any)],
      b2: java.util.TreeSet[(Long, Any)]): java.util.TreeSet[(Long, Any)] = {
    val it = b2.iterator()
    while (it.hasNext) {
      val e = it.next()
      insert(b1, e._1, e._2) // already-copied keys; insert dedups/evicts
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[(Long, Any)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.descendingIterator() // best-first
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(e._2, e._1)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Any)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e._1)
      if (isString) {
        val bytes = e._2.asInstanceOf[UTF8String].getBytes
        out.writeInt(bytes.length)
        out.write(bytes)
      } else out.writeLong(e._2.asInstanceOf[Number].longValue())
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(
      bytes: Array[Byte]): java.util.TreeSet[(Long, Any)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val w = in.readLong()
      val key: Any =
        if (isString) {
          val len = in.readInt()
          val b = new Array[Byte](len)
          in.readFully(b)
          UTF8String.fromBytes(b)
        } else if (item.dataType == IntegerType)
          Integer.valueOf(in.readLong().toInt)
        else java.lang.Long.valueOf(in.readLong())
      buf.add((w, key))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): BoundedTopKAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(
      newOffset: Int): BoundedTopKAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0), weight = newChildren(1),
      kExpr = newChildren(2))

  override def prettyName: String =
    if (smallest) "graft_bottom_k" else "graft_top_k"
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** K-Minimum-Values distinct-count sketch (Bar-Yossef et al. 2002; the
  * estimator family behind Theta sketches) as a native Catalyst
  * [[TypedImperativeAggregate]] — the "approx_count_distinct at 100 TB"
  * path that, unlike HLL, is DETERMINISTIC and cross-engine reproducible:
  * the sketch keeps the k smallest [[Sha256Prefix64Util.hash64]] values,
  * so a DuckDB oracle can replay it exactly (`ORDER BY h LIMIT k`).
  *
  * Estimate: exact |S| while fewer than k distinct hashes were seen;
  * otherwise `(k-1) · 2⁶³ / h_k` (the k-th minimum hash estimates the
  * density of the hashed population in [0, 2⁶³)).
  *
  * Scale shape: constant O(k) state per group, partial aggregation on
  * the map side, merges are sorted-set unions truncated to k — the same
  * communication pattern as `approx_count_distinct`, with ~6% relative
  * error at k=256 (1/√k). */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 16, "kmv_distinct needs k >= 16 for a usable estimate")

  override def prettyName: String = "kmv_distinct"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_distinct requires a STRING child (hash the value's rendering " +
          s"explicitly), got ${child.dataType.catalogString}")
    }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h): Unit }
    else if (h < buf.last()) { if (buf.add(h)) { buf.remove(buf.last()): Unit } }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, Sha256Prefix64Util.hash64(v.asInstanceOf[UTF8String]))
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * 9223372036854775808.0 / buf.last().toDouble

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add(bb.getLong): Unit)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren.head)
}

object KmvDistinct {
  /** Column-API entry point: `kmv(c, k)` — c must be a string column. */
  def of(c: Column, k: Int): Column =
    Bridge.column(KmvDistinct(Bridge.expression(c), k).toAggregateExpression())
}

/** The MERGEABLE form of [[KmvDistinct]]: returns the sketch itself (the
  * sorted k-min hash array) instead of collapsing to an estimate — the
  * Theta-sketch building block for SET ALGEBRA over summaries. Two
  * sketches built over different slices (or different partitions, days,
  * corpora) combine with plain array expressions downstream:
  * union-estimate from the k smallest of the merged arrays,
  * intersection via the KMV Jaccard rule (|A∩B within the union's k-min|
  * / k), no second pass over raw data. State is the same O(k) TreeSet;
  * output is ARRAY<BIGINT> ascending, so a SQL oracle replays it as
  * `ORDER BY h LIMIT k`. */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 16, "kmv_sketch needs k >= 16 for a usable estimate")

  private val impl = KmvDistinct(child, k)

  override def prettyName: String = "kmv_sketch"
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    impl.checkInputDataTypes()

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    impl.createAggregationBuffer()
  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] =
    impl.update(buf, input)
  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] =
    impl.merge(buf, other)

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 } // TreeSet iterates ascending
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    impl.serialize(buf)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    impl.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)
}

object KmvSketch {
  /** Column-API entry point: `kmv_sketch(c, k)` — c must be a string column. */
  def of(c: Column, k: Int): Column =
    Bridge.column(KmvSketch(Bridge.expression(c), k).toAggregateExpression())
}

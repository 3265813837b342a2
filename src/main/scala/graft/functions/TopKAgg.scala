package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Per-key top-k as a PARTIAL-AGGREGATABLE function (SURVEY §2.9,
  * aggregate tier): `topk_pairs(value, id, k)` keeps a bounded k-element
  * heap per group and merges heaps across partitions.
  *
  * Why this exists: the window form of per-key top-k
  * (`row_number() OVER (PARTITION BY key ORDER BY v DESC) <= k`,
  * q_window_topk_orders) must shuffle EVERY row to its key's partition
  * and sort there — at 100 TB that is a full-data shuffle to keep ~k
  * rows per key. As a TypedImperativeAggregate the plan becomes
  * ObjectHashAggregate with a map-side partial: each input partition
  * reduces to ≤ k entries per local key BEFORE the shuffle, so the
  * exchange carries O(keys × k) data instead of O(rows) — the same
  * partial-combine shape Spark gives sum/count for free.
  *
  * Determinism: ordering is (value DESC, id ASC) — a TOTAL order, so
  * heap contents never depend on arrival order and the result is
  * engine-reproducible (ties broken by id).
  *
  * Output: `array<struct<v double, id bigint>>` sorted by the same
  * total order; `posexplode` turns it into ranked rows.
  */
case class TopKPairs(valueExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"topk_pairs: k must be > 0, got $k")

  override def children: Seq[Expression] = Seq(valueExpr, idExpr)

  /** Analysis-time contract (registration wraps the arguments in
    * casts to DOUBLE/BIGINT, see TopKPairs.build, so DECIMAL/INT/FLOAT
    * inputs coerce instead of throwing ClassCastException in update());
    * this check rejects a hand-constructed instance whose children are
    * not the buffer types. NaN values sort as strongest, matching
    * Spark's own double ordering (NaN is greatest in ORDER BY), so the
    * window form and this aggregate agree. */
  override def checkInputDataTypes(): TypeCheckResult =
    if (valueExpr.dataType == DoubleType && idExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_pairs(value, id, k) needs (DOUBLE, BIGINT) after casts, " +
        s"got (${valueExpr.dataType.sql}, ${idExpr.dataType.sql})")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow)
      : TopKBuffer = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      buffer.offer(v.asInstanceOf[Double], id.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.foreach((v, id) => buffer.offer(v, id))
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val sorted = buffer.sortedDesc
    new GenericArrayData(sorted.map { case (v, id) =>
      new GenericInternalRow(Array[Any](v, id)): Any
    })
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = buffer.sortedDesc
    out.writeInt(entries.length)
    entries.foreach { case (v, id) =>
      out.writeDouble(v); out.writeLong(id)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.offer(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKPairs {
  /** Registration-time builder: wraps value/id in casts to the buffer
    * types so any numeric argument (DECIMAL, INT, FLOAT) resolves —
    * the implicit-cast contract, expressed with public Cast nodes
    * (AbstractDataType/ImplicitCastInputTypes are private[sql]).
    *
    * The id cast is gated on the argument being an INTEGRAL type:
    * Spark's implicit casts never narrow double→bigint, and a blanket
    * Cast would silently truncate fractional ids and null out
    * unparseable strings (rows then silently skipped in update()). */
  def build(es: Seq[Expression]): TopKPairs = {
    val k = literalK(es)
    if (es(0).resolved && !es(0).dataType.isInstanceOf[NumericType])
      throw new IllegalArgumentException(
        s"topk_pairs: value must be numeric, got ${es(0).dataType.sql}")
    if (es(1).resolved && !integral(es(1).dataType))
      throw new IllegalArgumentException(
        s"topk_pairs: id must be an integral type (TINYINT/SMALLINT/" +
          s"INT/BIGINT — implicit casts never narrow), got " +
          es(1).dataType.sql)
    TopKPairs(Cast(es(0), DoubleType), Cast(es(1), LongType), k)
  }

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** The k argument must be a foldable integer literal — aggregation
    * state is sized at plan time. */
  def literalK(es: Seq[Expression]): Int = {
    require(es.length == 3,
      "topk_pairs(value, id, k) takes exactly 3 arguments")
    LiteralArg.int("topk_pairs", es(2), "k")
  }
}

/** Bounded top-k heap over (value, id) with the total order
  * (value DESC, id ASC). The heap root is the WEAKEST kept entry, so
  * offer() is O(log k) and the buffer never exceeds k entries — the
  * invariant that keeps the partial-aggregate state (and its shuffle
  * bytes) bounded regardless of input size. */
final class TopKBuffer(k: Int) {
  // min-heap on the keep-order: weakest first
  private val heap = new java.util.PriorityQueue[(Double, Long)](
    math.min(k, 16),
    (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(a._1, b._1) // smaller value first
      if (c != 0) c else java.lang.Long.compare(b._2, a._2) // larger id first
    })

  def offer(v0: Double, id: Long): Unit = {
    // canonicalize -0.0 → +0.0 on entry: Double.compare orders
    // -0.0 < 0.0 but Spark's ORDER BY treats them as EQUAL
    // (nanSafeCompareDoubles), so without this the aggregate and the
    // window form could disagree on inputs containing negative zero
    // (NaN + 0.0 = NaN, so the NaN-greatest order is unaffected)
    val v = v0 + 0.0
    if (heap.size < k) { heap.offer((v, id)); return }
    val weakest = heap.peek()
    // stronger = larger value, or equal value with smaller id — via
    // Double.compare so NaN ranks GREATEST, the same total order as the
    // heap comparator and Spark's ORDER BY (a primitive `>` here would
    // silently discard NaN and make results arrival-order dependent)
    val c = java.lang.Double.compare(v, weakest._1)
    if (c > 0 || (c == 0 && id < weakest._2)) {
      heap.poll(); heap.offer((v, id))
    }
  }

  def foreach(f: (Double, Long) => Unit): Unit = {
    val it = heap.iterator()
    while (it.hasNext) { val e = it.next(); f(e._1, e._2) }
  }

  def sortedDesc: Array[(Double, Long)] = {
    val arr = heap.toArray(new Array[(Double, Long)](heap.size))
    // Double.compare keeps NaN consistently greatest here too, so the
    // output order agrees with the heap's keep/evict decisions
    java.util.Arrays.sort(arr,
      (a: (Double, Long), b: (Double, Long)) => {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      })
    arr
  }
}

package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Bounded per-key top-`cap` aggregate: keeps the `cap` smallest
 * `(sortKey, id)` pairs seen in the group and returns the ids in
 * ascending order.
 *
 * Why this exists: the C4-style quota/sample cut ("keep each key's
 * `cap` rows with the smallest md5(id)") is naturally expressed as
 * `row_number().over(partitionBy(key).orderBy(md5))`, but a window
 * drags EVERY row of a hot key through one task's sort — at crawl
 * scale a mega-domain (10^8-10^9 docs) serialises on that task. This
 * aggregate makes the cut PARTIAL-AGGREGABLE: each map task keeps at
 * most `cap` entries per key (constant-size buffer, early-skip once
 * full), the shuffle then carries ≤cap entries per (partition, key),
 * and the reduce merge is a bounded sorted-set union. Task time under
 * a planted 100x hot key stays flat — the same bound-the-hot-key move
 * as `min(struct)` first-occurrence in `DedupOps.dedupSegments`.
 *
 * Semantics are bit-identical to the window formulation (the union of
 * per-partition top-caps contains the global top-cap), so the DuckDB
 * `row_number() OVER (... ORDER BY md5(id), id)` oracle is unchanged.
 */
case class BoundedMinIds(
    sortKey: Expression,
    id: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(String, String)]] {

  require(cap > 0, s"cap must be positive, got $cap")

  private def ord: Ordering[(String, String)] =
    Ordering.Tuple2(Ordering.String, Ordering.String)

  override def createAggregationBuffer(): java.util.TreeSet[(String, String)] =
    new java.util.TreeSet[(String, String)](ord)

  override def update(buf: java.util.TreeSet[(String, String)],
                      input: InternalRow): java.util.TreeSet[(String, String)] = {
    val k = sortKey.eval(input)
    val i = id.eval(input)
    if (k != null && i != null) {
      val cand = (k.toString, i.toString)
      // early-skip: a full buffer whose max is <= the candidate cannot
      // change — this is what keeps the hot-key map task O(n) with a
      // constant-size buffer instead of O(n log n) with an n-row sort
      if (buf.size < cap || ord.lt(cand, buf.last())) {
        buf.add(cand)
        if (buf.size > cap) buf.pollLast()
      }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[(String, String)],
                     other: java.util.TreeSet[(String, String)])
      : java.util.TreeSet[(String, String)] = {
    val it = other.iterator()
    var done = false
    while (it.hasNext && !done) {
      val cand = it.next()
      if (buf.size < cap || ord.lt(cand, buf.last())) {
        buf.add(cand)
        if (buf.size > cap) buf.pollLast()
      } else done = true // `other` is ascending: the rest are larger
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[(String, String)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()._2); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(String, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val (k, i) = it.next()
      out.writeUTF(k); out.writeUTF(i)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(String, String)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add((in.readUTF(), in.readUTF())); i += 1 }
    buf
  }

  override def children: Seq[Expression] = Seq(sortKey, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bounded_min_ids"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinIds =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinIds =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sortKey = newChildren(0), id = newChildren(1))
}

/** Mutable bounded MULTISET of (sortKey, id) pairs — [[BoundedMinPairs]]'
  * aggregation buffer. Entries carry a multiplicity so duplicate input
  * rows rank exactly like `row_number` would rank them (the TreeSet
  * form silently collapsed equal pairs — an untested divergence from
  * the window formulation this replaces). */
final class PairBag {
  val m = new java.util.TreeMap[(Double, Long), Int](PairBag.ord)
  var total = 0

  /** One bounded insert: admit when under `cap`, or when strictly
    * smaller than the current max (then evict one instance of the
    * max). A candidate EQUAL to the max of a full bag is rank cap+1 in
    * the window formulation — correctly skipped. */
  def add(cand: (Double, Long), cap: Int): Unit = {
    if (total < cap) {
      m.merge(cand, 1, (a: Int, b: Int) => a + b)
      total += 1
    } else if (PairBag.ord.lt(cand, m.lastKey())) {
      m.merge(cand, 1, (a: Int, b: Int) => a + b)
      val last = m.lastEntry()
      if (last.getValue > 1) m.put(last.getKey, last.getValue - 1)
      else m.remove(last.getKey)
    }
  }
}

object PairBag {
  val ord: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
}

/**
 * Bounded per-key top-`cap` (sortKey, id) PAIRS: keeps the `cap`
 * smallest `(double sortKey, long id)` pairs seen in the group and
 * returns them ascending as `array<struct<s: double, id: bigint>>` —
 * the position in the array IS the rank.
 *
 * This is [[BoundedMinIds]] for the ANN top-k cut: `row_number().over(
 * partitionBy(query).orderBy(score, id))` drags every scored
 * (query, neighbor) row through one task's sort per query — at corpus
 * scale the per-query candidate set is the whole corpus for the exact
 * faces, and the window shuffle carries q·corpus rows. This aggregate
 * makes the cut partial-aggregable: each map task keeps ≤cap pairs per
 * query (constant-size buffer, early-skip once full), the shuffle
 * carries ≤cap entries per (partition, query), and the reduce merge is
 * a bounded sorted-multiset union. Selection and order are IDENTICAL
 * to the window formulation (the union of per-partition top-caps
 * contains the global top-cap; ties break by id ascending; duplicate
 * (sortKey, id) input rows carry multiplicity, exactly as row_number
 * counts them). Descending sorts ride a negated sortKey (exact in IEEE
 * doubles). NaN sort keys order largest (total order), matching
 * Spark's sort; null sortKey/id rows are skipped like
 * [[BoundedMinIds]].
 */
case class BoundedMinPairs(
    sortKey: Expression,
    id: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PairBag] {

  require(cap > 0, s"cap must be positive, got $cap")

  override def createAggregationBuffer(): PairBag = new PairBag

  override def update(buf: PairBag, input: InternalRow): PairBag = {
    val k = sortKey.eval(input)
    val i = id.eval(input)
    if (k != null && i != null)
      buf.add((k.asInstanceOf[Double], i.asInstanceOf[Long]), cap)
    buf
  }

  override def merge(buf: PairBag, other: PairBag): PairBag = {
    val it = other.m.entrySet().iterator()
    var done = false
    while (it.hasNext && !done) {
      val e = it.next()
      // `other` is ascending: once a key can't be admitted (full bag,
      // key >= max), none of the rest can
      if (buf.total >= cap && !PairBag.ord.lt(e.getKey, buf.m.lastKey()))
        done = true
      else {
        var c = e.getValue
        while (c > 0) { buf.add(e.getKey, cap); c -= 1 }
      }
    }
    buf
  }

  override def eval(buf: PairBag): Any = {
    val out = new Array[Any](buf.total)
    val it = buf.m.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      val (s, id) = e.getKey
      var c = e.getValue
      while (c > 0) { out(i) = InternalRow(s, id); i += 1; c -= 1 }
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: PairBag): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.m.size())
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeDouble(e.getKey._1); out.writeLong(e.getKey._2)
      out.writeInt(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): PairBag = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val k = (in.readDouble(), in.readLong())
      val c = in.readInt()
      buf.m.put(k, c)
      buf.total += c
      i += 1
    }
    buf
  }

  override def children: Seq[Expression] = Seq(sortKey, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("s", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_bounded_min_pairs"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sortKey = newChildren(0), id = newChildren(1))
}

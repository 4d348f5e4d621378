package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/**
 * Distributed bloom-bytes build as ONE aggregate: each input row's
 * 64-bit hash sets its [[VectorExpressions.bloomSeed]] positions in a
 * per-partition buffer, partials OR-merge, and the final value is the
 * filter's byte array — bit-compatible with the probe side
 * ([[VectorExpressions.BloomContains]] / `BloomContainsBc`).
 *
 * Why not the explode → per-word `bit_or` → collect formulation: a
 * drop of d rows explodes to `d·numHashes` position rows whose
 * grouped result — up to min(d·numHashes, numBits/64) rows — all
 * collect to the driver; at the cc/Id ledgers' gate scale that was
 * ~270k small rows (row overhead ≫ payload) per ingest. Here the
 * aggregate's SHUFFLE carries one sparse-serialized buffer per map
 * partition (positions while the set is small — `9·|positions|`
 * bytes — switching to the dense bitmap only past the break-even),
 * and exactly ONE binary row reaches the driver.
 */
case class BloomBytesAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBytesAgg.Buf] {

  require(numBits % 64 == 0 && numBits > 0,
    s"numBits must be a positive multiple of 64, got $numBits")

  override def createAggregationBuffer(): BloomBytesAgg.Buf =
    new BloomBytesAgg.Buf(numBits)

  override def update(buf: BloomBytesAgg.Buf,
                      input: InternalRow): BloomBytesAgg.Buf = {
    val h = child.eval(input)
    if (h != null) {
      val (h1, h2) = VectorExpressions.bloomSeed(h.asInstanceOf[Long])
      var i = 0
      while (i < numHashes) {
        buf.add(java.lang.Math.floorMod(h1 + i * h2, numBits.toLong))
        i += 1
      }
    }
    buf
  }

  override def merge(buf: BloomBytesAgg.Buf,
                     other: BloomBytesAgg.Buf): BloomBytesAgg.Buf = {
    buf.or(other); buf
  }

  override def eval(buf: BloomBytesAgg.Buf): Any = buf.toBytes

  override def serialize(buf: BloomBytesAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    if (buf.dense != null) {
      out.writeByte(1)
      out.write(buf.dense)
    } else {
      out.writeByte(0)
      out.writeInt(buf.set.size())
      buf.set.forEach { p => out.writeLong(p) }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomBytesAgg.Buf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    if (in.readByte() == 1) {
      buf.densify()
      var off = 0
      while (off < buf.dense.length) {
        val n = in.read(buf.dense, off, buf.dense.length - off)
        require(n > 0, "truncated dense bloom buffer")
        off += n
      }
    } else {
      val n = in.readInt()
      var i = 0
      while (i < n) { buf.add(in.readLong()); i += 1 }
    }
    buf
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBytesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBytesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object BloomBytesAgg {
  /** Sparse-until-break-even position buffer: a HashSet of positions
    * while `12·|set| ≤ numBits/8` (boxed-long heap ≈ serialized cost
    * order), a dense bitmap after. Small drops stay tiny through the
    * shuffle; saturated partitions cap at the bitmap. */
  final class Buf(val numBits: Int) {
    private[functions] var set: java.util.HashSet[java.lang.Long] =
      new java.util.HashSet[java.lang.Long]()
    private[functions] var dense: Array[Byte] = null

    def add(pos: Long): Unit =
      if (dense != null) {
        val p = pos.toInt
        dense(p >> 3) = (dense(p >> 3) | (1 << (p & 7)).toByte).toByte
      } else {
        set.add(pos)
        if (set.size().toLong * 12 > numBits / 8) densify()
      }

    private[functions] def densify(): Unit = if (dense == null) {
      // idempotent: a second call must NOT wipe accumulated state —
      // or() densifies before every dense merge
      dense = new Array[Byte](numBits / 8)
      if (set != null) set.forEach { pos =>
        val p = pos.toInt
        dense(p >> 3) = (dense(p >> 3) | (1 << (p & 7)).toByte).toByte
      }
      set = null
    }

    def or(other: Buf): Unit =
      if (other.dense != null) {
        densify()
        var i = 0
        while (i < dense.length) {
          dense(i) = (dense(i) | other.dense(i)).toByte
          i += 1
        }
      } else other.set.forEach { p => add(p.longValue()) }

    def toBytes: Array[Byte] = {
      if (dense == null) densify()
      dense
    }
  }
}

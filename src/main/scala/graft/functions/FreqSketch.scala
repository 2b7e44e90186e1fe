package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded Misra-Gries frequent-items summary (Misra & Gries 1982;
  * merge rule per Agarwal et al., "Mergeable Summaries", PODS 2012).
  * At most `cap` counters whatever the stream; after processing n
  * items every key with true count > n/(cap+1) is GUARANTEED present,
  * and each surviving counter undercounts by at most n/(cap+1).
  * That one-sided guarantee is exactly what a two-pass heavy-hitters
  * plan needs: the summary proposes a small, provably-sufficient
  * candidate set and an exact verify pass (candidates only —
  * broadcast semi-join, no full-key shuffle) assigns true counts.
  */
final class MgSummary(val cap: Int) extends Serializable {
  var n: Long = 0L
  val counters = mutable.HashMap.empty[UTF8String, Long]

  def add(v: UTF8String): Unit = {
    n += 1
    counters.get(v) match {
      case Some(c) => counters.update(v, c + 1)
      case None if counters.size < cap => counters.update(v.clone(), 1L)
      case None =>
        // classic decrement-all step: one new item pays one unit of
        // every counter; error grows by ≤ 1 per n/(cap+1) inputs
        val dead = List.newBuilder[UTF8String]
        counters.keysIterator.foreach { k =>
          val c = counters(k) - 1
          if (c <= 0) dead += k else counters.update(k, c)
        }
        dead.result().foreach(counters.remove)
    }
  }

  def merge(o: MgSummary): Unit = {
    n += o.n
    o.counters.foreach { case (k, v) =>
      counters.update(k, counters.getOrElse(k, 0L) + v)
    }
    if (counters.size > cap) {
      // subtract the (cap+1)-th largest weight from every counter and
      // drop the non-positive — the mergeable-summaries rule that
      // preserves the additive n/(cap+1) error bound
      val cut = counters.values.toSeq.sorted(Ordering[Long].reverse)
        .apply(cap)
      val dead = List.newBuilder[UTF8String]
      counters.keysIterator.foreach { k =>
        val c = counters(k) - cut
        if (c <= 0) dead += k else counters.update(k, c)
      }
      dead.result().foreach(counters.remove)
    }
  }
}

/** Aggregate wrapper: `misra_gries(key, cap)` → one
  * `struct<n: bigint, keys: array<string>>` row. `n` counts non-null
  * inputs; `keys` is the surviving candidate set, sorted so the
  * summary row itself is deterministic ONLY in membership-superset
  * terms — which keys survive beyond the guaranteed ones depends on
  * partitioning, so downstream plans must treat `keys` as a candidate
  * proposal and verify exactly (see `Sketches.heavyHitters`), never
  * hash the raw summary.
  */
case class MisraGriesAgg(
    child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgSummary] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType),
    StructField("keys", ArrayType(StringType))))

  override def createAggregationBuffer(): MgSummary = new MgSummary(cap)

  override def update(st: MgSummary, input: InternalRow): MgSummary = {
    val v = child.eval(input).asInstanceOf[UTF8String]
    if (v != null) st.add(v)
    st
  }

  override def merge(buf: MgSummary, other: MgSummary): MgSummary = {
    buf.merge(other)
    buf
  }

  override def eval(st: MgSummary): Any = {
    val keys = st.counters.keysIterator.toArray
      .sortBy(_.toString).map(_.asInstanceOf[Any])
    InternalRow(st.n, new GenericArrayData(keys))
  }

  private def writeStr(out: DataOutputStream, s: UTF8String): Unit = {
    val b = s.getBytes
    out.writeInt(b.length)
    out.write(b)
  }

  override def serialize(st: MgSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream(16 + st.counters.size * 48)
    val out = new DataOutputStream(bos)
    out.writeLong(st.n)
    out.writeInt(st.counters.size)
    st.counters.foreach { case (k, v) => writeStr(out, k); out.writeLong(v) }
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new MgSummary(cap)
    st.n = in.readLong()
    val k = in.readInt()
    (0 until k).foreach { _ =>
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      st.counters.update(UTF8String.fromBytes(b), in.readLong())
    }
    in.close()
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = c(0))
}

object FreqSketch {
  /** Column entry point: `misraGries($"key", cap)`. */
  def misraGries(c: Column, cap: Int): Column =
    Shims.column(MisraGriesAgg(Shims.expression(c), cap)
      .toAggregateExpression())
}

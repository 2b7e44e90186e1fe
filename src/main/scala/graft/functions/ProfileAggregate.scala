package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Small dense HyperLogLog (2^p registers) for the profile buffer's
  * approx-distinct mode. Public algorithm (Flajolet et al.); hash input
  * is a 64-bit avalanche of the value string.
  */
final class Hll(val p: Int = 12) extends Serializable {
  val regs = new Array[Byte](1 << p)

  def addHash(h: Long): Unit = {
    val idx = (h >>> (64 - p)).toInt
    val rank = (java.lang.Long.numberOfLeadingZeros((h << p) | (1L << (p - 1))) + 1)
      .toByte
    if (rank > regs(idx)) regs(idx) = rank
  }

  def merge(o: Hll): Unit = {
    var i = 0
    while (i < regs.length) {
      if (o.regs(i) > regs(i)) regs(i) = o.regs(i)
      i += 1
    }
  }

  def estimate: Long = {
    val m = regs.length
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += 1.0 / (1L << regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m * m / sum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.round(est)
  }
}

object Hll {
  /** 64-bit avalanche (splitmix64 finalizer) over a string's UTF-8
    * bytes via a simple polynomial roll — deterministic and fast.
    */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ bytes(i)) * 0x100000001b3L
      i += 1
    }
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }
}

/** Open-addressed set of 64-bit hashes (no boxing, fast serialize).
  * Zero is reserved as the empty slot; a zero hash is remapped.
  */
final class LongSet(initialCap: Int = 1 << 10) extends Serializable {
  private var table = new Array[Long](Integer.highestOneBit(
    math.max(initialCap - 1, 8)) << 1)
  private var n = 0

  def size: Int = n

  def add(h0: Long): Unit = {
    val h = if (h0 == 0L) 0x5ca1ab1eL else h0
    var i = (h.toInt ^ (h >>> 32).toInt) & (table.length - 1)
    while (table(i) != 0L) {
      if (table(i) == h) return
      i = (i + 1) & (table.length - 1)
    }
    table(i) = h
    n += 1
    if (n * 10 >= table.length * 7) grow()
  }

  private def grow(): Unit = {
    val old = table
    table = new Array[Long](old.length << 1)
    n = 0
    var j = 0
    while (j < old.length) {
      if (old(j) != 0L) add(old(j))
      j += 1
    }
  }

  def foreachHash(f: Long => Unit): Unit = {
    var j = 0
    while (j < table.length) {
      if (table(j) != 0L) f(table(j))
      j += 1
    }
  }
}

/** Per-path statistics buffer state. Distinct values tracked as 64-bit
  * value hashes in an exact set up to `exactLimit`, then degraded to
  * HLL — the reference keeps unbounded exact sets of raw values
  * (`core/analyser.py:49,57,142,188`), which cannot survive 100 TB;
  * this bound is the SURVEY §7.3 fix. (Hash-set "exact" counting is
  * exact up to 64-bit collisions: P ≈ n²/2⁶⁵, ~3e-10 at the limit.)
  */
final class PathStats(val exactLimit: Int) extends Serializable {
  var seen: Long = 0L
  var present: Long = 0L
  val typeCounts = mutable.HashMap.empty[String, Long]
  var numMin: Double = Double.NaN
  var numMax: Double = Double.NaN
  var tsMin: Long = Long.MaxValue
  var tsMax: Long = Long.MinValue
  var exact: LongSet = new LongSet()
  var hll: Hll = null

  /** Misra-Gries heavy-hitters counters for top-k string values
    * (`value_frequencies`, `core/analyser.py:202-204`): at most
    * `TopkCap` counters; counts are exact when distinct strings ≤ cap,
    * otherwise lower bounds with error ≤ n/cap — the bounded
    * single-pass answer to the reference's unbounded Counter.
    */
  val topk = mutable.HashMap.empty[String, Long]

  def addTopk(v: String): Unit =
    if (topk.contains(v)) topk(v) += 1
    else if (topk.size < PathStats.TopkCap) topk.update(v, 1L)
    else {
      val dead = List.newBuilder[String]
      topk.keysIterator.foreach { k =>
        val c = topk(k) - 1
        if (c <= 0) dead += k else topk.update(k, c)
      }
      dead.result().foreach(topk.remove)
    }

  private def mergeTopk(o: mutable.HashMap[String, Long]): Unit = {
    o.foreach { case (k, v) =>
      topk.update(k, topk.getOrElse(k, 0L) + v)
    }
    if (topk.size > PathStats.TopkCap) {
      // keep the cap heaviest, subtracting the (cap+1)-th weight (the
      // standard MG merge, preserving the n/cap error bound)
      val cut = topk.values.toSeq.sorted(Ordering[Long].reverse)
        .apply(PathStats.TopkCap)
      val dead = List.newBuilder[String]
      topk.keysIterator.foreach { k =>
        val c = topk(k) - cut
        if (c <= 0) dead += k else topk.update(k, c)
      }
      dead.result().foreach(topk.remove)
    }
  }

  def approx: Boolean = hll != null

  private def degrade(): Unit = {
    hll = new Hll()
    exact.foreachHash(hll.addHash)
    exact = null
  }

  def addDistinct(v: UTF8String): Unit = addDistinctHash(Hll.hash(v))

  def addDistinctHash(h: Long): Unit =
    if (hll != null) hll.addHash(h)
    else {
      exact.add(h)
      if (exact.size > exactLimit) degrade()
    }

  def cardinality: Long = if (hll != null) hll.estimate else exact.size.toLong

  def mergeFrom(o: PathStats): Unit = {
    seen += o.seen
    present += o.present
    o.typeCounts.foreach { case (k, v) =>
      typeCounts.update(k, typeCounts.getOrElse(k, 0L) + v)
    }
    if (!o.numMin.isNaN) numMin =
      if (numMin.isNaN) o.numMin else math.min(numMin, o.numMin)
    if (!o.numMax.isNaN) numMax =
      if (numMax.isNaN) o.numMax else math.max(numMax, o.numMax)
    tsMin = math.min(tsMin, o.tsMin)
    tsMax = math.max(tsMax, o.tsMax)
    mergeTopk(o.topk)
    (approx, o.approx) match {
      case (true, true)   => hll.merge(o.hll)
      case (true, false)  => o.exact.foreachHash(hll.addHash)
      case (false, true)  =>
        val mine = exact
        hll = new Hll(); exact = null
        mine.foreachHash(hll.addHash)
        hll.merge(o.hll)
      case (false, false) => o.exact.foreachHash(addDistinctHash)
    }
  }
}

object PathStats {
  /** Misra-Gries counter budget per path (error ≤ n/TopkCap). */
  val TopkCap = 32
}

/** Single-pass whole-profile aggregate (SURVEY §4.2.2): one mutable
  * buffer carries {seen, present, type histogram, numeric/temporal
  * min-max, bounded-exact-then-HLL distinct} for EVERY path at once —
  * the distributed version of the reference's single stats dict
  * (`core/analyser.py:47-66`).
  *
  * Contrast with [[graft.operators.Profiler.profileStats]] (built-in
  * aggregates): that plan shuffles every distinct (path, value) pair for
  * the exact `countDistinct`. This aggregate shuffles exactly one
  * serialized buffer per partition — at 100 TB the difference between
  * shuffling terabytes and shuffling kilobytes. Exact-distinct parity
  * holds below `exactLimit` per path; beyond it cardinality is HLL
  * (±~1.6%) and the `_approx` flag reports the degradation.
  *
  * Input: the 5 flatten columns (path, vstr, vnum, vts, vtag).
  * Output: array of per-path stat structs, exploded by the caller.
  */
case class ProfileAggregate(
    path: Expression, vstr: Expression, vnum: Expression,
    vts: Expression, vtag: Expression,
    exactLimit: Int = 100000,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, PathStats]] {

  override def children: Seq[Expression] =
    Seq(path, vstr, vnum, vts, vtag)
  override def nullable: Boolean = false

  val outputStruct: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("seen", LongType),
    StructField("n_present", LongType),
    StructField("cardinality", LongType),
    StructField("cardinality_approx", BooleanType),
    StructField("num_min", DoubleType),
    StructField("num_max", DoubleType),
    StructField("ts_min", StringType),
    StructField("ts_max", StringType),
    StructField("type_counts", MapType(StringType, LongType)),
    StructField("top_values", MapType(StringType, LongType))))

  override def dataType: DataType = ArrayType(outputStruct)

  override def createAggregationBuffer(): mutable.HashMap[String, PathStats] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, PathStats],
                      input: InternalRow): mutable.HashMap[String, PathStats] = {
    val p = path.eval(input).asInstanceOf[UTF8String]
    if (p == null) return buf
    val st = buf.getOrElseUpdate(p.toString, new PathStats(exactLimit))
    st.seen += 1
    val tag = vtag.eval(input).asInstanceOf[UTF8String]
    if (tag != null)
      st.typeCounts.update(tag.toString,
        st.typeCounts.getOrElse(tag.toString, 0L) + 1)
    val s = vstr.eval(input).asInstanceOf[UTF8String]
    if (s != null) {
      st.present += 1
      st.addDistinct(s)
      // top-k: strings under 256 chars only (core/analyser.py:202-204)
      if (tag != null && tag.toString == "str" && s.numChars() < 256)
        st.addTopk(s.toString)
    }
    val n = vnum.eval(input)
    if (n != null) {
      val d = n.asInstanceOf[Double]
      if (st.numMin.isNaN || d < st.numMin) st.numMin = d
      if (st.numMax.isNaN || d > st.numMax) st.numMax = d
    }
    val t = vts.eval(input)
    if (t != null) {
      val micros = t.asInstanceOf[Long]
      if (micros < st.tsMin) st.tsMin = micros
      if (micros > st.tsMax) st.tsMax = micros
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, PathStats],
                     other: mutable.HashMap[String, PathStats])
      : mutable.HashMap[String, PathStats] = {
    other.foreach { case (p, st) =>
      buf.get(p) match {
        case Some(mine) => mine.mergeFrom(st)
        case None       => buf.update(p, st)
      }
    }
    buf
  }

  // session-timezone formatter so output matches Profiler.profileStats'
  // date_format rendering under any spark.sql.session.timeZone
  @transient private lazy val isoFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
      .withZone(java.time.ZoneId.of(
        org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))

  /** Epoch-micros → Instant without the micros×1000 multiply, which
    * overflows Long beyond ~year 2262.
    */
  private def microsToInstant(micros: Long): Instant =
    Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L),
      Math.floorMod(micros, 1000000L) * 1000L)

  override def eval(buf: mutable.HashMap[String, PathStats]): Any = {
    val rows = buf.toSeq.sortBy(_._1).map { case (p, st) =>
      InternalRow(
        UTF8String.fromString(p),
        st.seen,
        st.present,
        st.cardinality,
        st.approx,
        if (st.numMin.isNaN) null else st.numMin,
        if (st.numMax.isNaN) null else st.numMax,
        if (st.tsMin == Long.MaxValue) null
        else UTF8String.fromString(isoFmt.format(microsToInstant(st.tsMin))),
        if (st.tsMax == Long.MinValue) null
        else UTF8String.fromString(isoFmt.format(microsToInstant(st.tsMax))),
        {
          val tc = st.typeCounts.toSeq.sortBy(_._1)   // deterministic order
          org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
            tc.map(t => UTF8String.fromString(t._1)).toArray,
            tc.map(_._2).toArray)
        }, {
          // top-5 cut, deterministic tie-break (count desc, value asc)
          val top5 = st.topk.toSeq.sortBy(t => (-t._2, t._1)).take(5)
          org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
            top5.map(t => UTF8String.fromString(t._1)).toArray,
            top5.map(_._2).toArray)
        })
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, PathStats])
      : Array[Byte] = {
    // raw stream, no compression: partial buffers can hold ~100k exact
    // strings and gzip turned serialization into the bottleneck
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (p, st) =>
      out.writeUTF(p)
      out.writeLong(st.seen); out.writeLong(st.present)
      out.writeInt(st.typeCounts.size)
      st.typeCounts.foreach { case (k, v) => out.writeUTF(k); out.writeLong(v) }
      out.writeDouble(st.numMin); out.writeDouble(st.numMax)
      out.writeLong(st.tsMin); out.writeLong(st.tsMax)
      out.writeInt(st.topk.size)
      st.topk.foreach { case (k, v) => out.writeUTF(k); out.writeLong(v) }
      out.writeBoolean(st.approx)
      if (st.approx) out.write(st.hll.regs)
      else {
        out.writeInt(st.exact.size)
        st.exact.foreachHash(out.writeLong)
      }
    }
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[String, PathStats] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = mutable.HashMap.empty[String, PathStats]
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val p = in.readUTF()
      val st = new PathStats(exactLimit)
      st.seen = in.readLong(); st.present = in.readLong()
      val nt = in.readInt()
      (0 until nt).foreach { _ =>
        val k = in.readUTF(); st.typeCounts.update(k, in.readLong())
      }
      st.numMin = in.readDouble(); st.numMax = in.readDouble()
      st.tsMin = in.readLong(); st.tsMax = in.readLong()
      val ntk = in.readInt()
      (0 until ntk).foreach { _ =>
        val k = in.readUTF(); st.topk.update(k, in.readLong())
      }
      if (in.readBoolean()) {
        st.hll = new Hll(); st.exact = null
        in.readFully(st.hll.regs)
      } else {
        val ne = in.readInt()
        (0 until ne).foreach(_ => st.exact.add(in.readLong()))
      }
      buf.update(p, st)
    }
    in.close()
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): ProfileAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ProfileAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): ProfileAggregate =
    copy(path = c(0), vstr = c(1), vnum = c(2), vts = c(3), vtag = c(4))
}

object ProfileAggregate {
  /** Column entry point over the 5 flatten columns. */
  def profileAgg(path: Column, vstr: Column, vnum: Column, vts: Column,
                 vtag: Column, exactLimit: Int = 100000): Column =
    Shims.column(ProfileAggregate(
      Shims.expression(path), Shims.expression(vstr),
      Shims.expression(vnum), Shims.expression(vts),
      Shims.expression(vtag), exactLimit).toAggregateExpression())
}

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

  /** splitmix64 finalizer over a raw long — the native-bits twin of
    * [[hash]] for lean-flatten numeric/temporal values.
    */
  def hashLong(x: Long): Long = {
    var h = x + 0x9e3779b97f4a7c15L
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
final class PathStats(val exactLimit: Int,
                      val topkCap: Int = PathStats.TopkCap)
    extends Serializable {
  var seen: Long = 0L
  var present: Long = 0L
  // UTF8String keys throughout: update() runs once per leaf row, and a
  // per-row UTF8String→String conversion was the aggregate's dominant
  // allocation cost. Keys are clone()d on first insert (eval-time
  // UTF8Strings point into reused row buffers).
  val typeCounts = mutable.HashMap.empty[UTF8String, Long]
  var numMin: Double = Double.NaN
  var numMax: Double = Double.NaN
  var tsMin: Long = Long.MaxValue
  var tsMax: Long = Long.MinValue
  var exact: LongSet = new LongSet()
  var hll: Hll = null

  def addType(tag: UTF8String): Unit =
    typeCounts.get(tag) match {
      case Some(c) => typeCounts.update(tag, c + 1)
      case None    => typeCounts.update(tag.clone(), 1L)
    }

  /** Misra-Gries heavy-hitters counters for top-k string values
    * (`value_frequencies`, `core/analyser.py:202-204`): at most
    * `topkCap` counters; counts are exact when distinct strings ≤ cap,
    * otherwise lower bounds with error ≤ n/cap — the bounded
    * single-pass answer to the reference's unbounded Counter.
    */
  val topk = mutable.HashMap.empty[UTF8String, Long]

  def addTopk(v: UTF8String): Unit =
    topk.get(v) match {
      case Some(c) => topk.update(v, c + 1)
      case None if topk.size < topkCap => topk.update(v.clone(), 1L)
      case None =>
        val dead = List.newBuilder[UTF8String]
        topk.keysIterator.foreach { k =>
          val c = topk(k) - 1
          if (c <= 0) dead += k else topk.update(k, c)
        }
        dead.result().foreach(topk.remove)
    }

  private def mergeTopk(o: mutable.HashMap[UTF8String, Long]): Unit = {
    o.foreach { case (k, v) =>
      topk.update(k, topk.getOrElse(k, 0L) + v)
    }
    if (topk.size > topkCap) {
      // keep the cap heaviest, subtracting the (cap+1)-th weight (the
      // standard MG merge, preserving the n/cap error bound)
      val cut = topk.values.toSeq.sorted(Ordering[Long].reverse)
        .apply(topkCap)
      val dead = List.newBuilder[UTF8String]
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
  /** Default Misra-Gries counter budget per path (error ≤ n/TopkCap). */
  val TopkCap = 32
}

/** Single-pass per-path profile aggregate (SURVEY §4.2.2): the buffer
  * carries {seen, present, type histogram, numeric/temporal min-max,
  * bounded-exact-then-HLL distinct, Misra-Gries top-k} for one path —
  * the distributed version of one entry of the reference's stats dict
  * (`core/analyser.py:47-66`). Callers group the flatten rows by
  * `path`, so partial buffers merge in PARALLEL across reducers (one
  * reducer per path), unlike a single global buffer whose final merge
  * would funnel every partition's distinct-hash set through one task.
  *
  * Contrast with [[graft.operators.Profiler.profileStats]] (built-in
  * aggregates): that plan shuffles every distinct (path, value) pair
  * for the exact `countDistinct`. This aggregate shuffles one
  * serialized buffer per (partition, path) — bounded by `exactLimit`
  * hashes each; with HLL mode (small `exactLimit` or high cardinality)
  * the buffer is 4 KB however big the data. Exact-distinct parity
  * holds below `exactLimit` per path; beyond it cardinality is HLL
  * (±~1.6%) and the `_approx` flag reports the degradation.
  *
  * Input: the 4 flatten value columns (vstr, vnum, vts, vtag).
  * Output: one stats struct (grouping key supplies the path).
  */
case class ProfileAggregate(
    vstr: Expression, vnum: Expression,
    vts: Expression, vtag: Expression,
    exactLimit: Int = 100000,
    topkCap: Int = PathStats.TopkCap,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PathStats] {

  override def children: Seq[Expression] =
    Seq(vstr, vnum, vts, vtag)
  override def nullable: Boolean = false

  private val strTag = UTF8String.fromString("str")

  val outputStruct: StructType = StructType(Seq(
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

  override def dataType: DataType = outputStruct

  override def createAggregationBuffer(): PathStats =
    new PathStats(exactLimit, topkCap)

  override def update(st: PathStats, input: InternalRow): PathStats = {
    st.seen += 1
    val tag = vtag.eval(input).asInstanceOf[UTF8String]
    if (tag != null) st.addType(tag)
    val s = vstr.eval(input).asInstanceOf[UTF8String]
    val n = vnum.eval(input)
    val t = vts.eval(input)
    if (s != null) {
      st.present += 1
      st.addDistinct(s)
      // top-k: strings under 256 chars only (core/analyser.py:202-204)
      if (tag != null && tag.equals(strTag) && s.numChars() < 256)
        st.addTopk(s)
    } else if (n != null) {
      // lean flatten (Profiler.flattenLean): numeric/temporal values
      // arrive without the rendered string — hash the native bits.
      // Rendering is injective per type, so distinct counts match the
      // string-hash domain exactly.
      st.present += 1
      st.addDistinctHash(
        Hll.hashLong(java.lang.Double.doubleToLongBits(n.asInstanceOf[Double])))
    } else if (t != null) {
      st.present += 1
      st.addDistinctHash(Hll.hashLong(t.asInstanceOf[Long]))
    }
    if (n != null) {
      val d = n.asInstanceOf[Double]
      if (st.numMin.isNaN || d < st.numMin) st.numMin = d
      if (st.numMax.isNaN || d > st.numMax) st.numMax = d
    }
    if (t != null) {
      val micros = t.asInstanceOf[Long]
      if (micros < st.tsMin) st.tsMin = micros
      if (micros > st.tsMax) st.tsMax = micros
    }
    st
  }

  override def merge(buf: PathStats, other: PathStats): PathStats = {
    buf.mergeFrom(other)
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

  override def eval(st: PathStats): Any =
    InternalRow(
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
        val tc = st.typeCounts.toSeq.sortBy(_._1.toString)   // deterministic
        org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
          tc.map(_._1).toArray, tc.map(_._2).toArray)
      }, {
        // top-5 cut, deterministic tie-break (count desc, value asc)
        val top5 = st.topk.toSeq.sortBy(t => (-t._2, t._1.toString)).take(5)
        org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
          top5.map(_._1).toArray, top5.map(_._2).toArray)
      })

  private def writeStr(out: DataOutputStream, s: UTF8String): Unit = {
    val b = s.getBytes
    out.writeInt(b.length)
    out.write(b)
  }

  private def readStr(in: DataInputStream): UTF8String = {
    val b = new Array[Byte](in.readInt())
    in.readFully(b)
    UTF8String.fromBytes(b)
  }

  override def serialize(st: PathStats): Array[Byte] = {
    // raw stream, no compression: a partial buffer can hold ~exactLimit
    // hashes and gzip turned serialization into the bottleneck; the
    // stream is pre-sized so a large hash set doesn't pay repeated
    // array doubling
    val sizeHint = 128 +
      (if (st.approx) st.hll.regs.length else st.exact.size * 8) +
      st.typeCounts.size * 48 + st.topk.size * 300
    val bos = new ByteArrayOutputStream(sizeHint)
    val out = new DataOutputStream(bos)
    out.writeLong(st.seen); out.writeLong(st.present)
    out.writeInt(st.typeCounts.size)
    st.typeCounts.foreach { case (k, v) => writeStr(out, k); out.writeLong(v) }
    out.writeDouble(st.numMin); out.writeDouble(st.numMax)
    out.writeLong(st.tsMin); out.writeLong(st.tsMax)
    out.writeInt(st.topk.size)
    st.topk.foreach { case (k, v) => writeStr(out, k); out.writeLong(v) }
    out.writeBoolean(st.approx)
    if (st.approx) out.write(st.hll.regs)
    else {
      out.writeInt(st.exact.size)
      st.exact.foreachHash(out.writeLong)
    }
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): PathStats = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new PathStats(exactLimit, topkCap)
    st.seen = in.readLong(); st.present = in.readLong()
    val nt = in.readInt()
    (0 until nt).foreach { _ =>
      val k = readStr(in); st.typeCounts.update(k, in.readLong())
    }
    st.numMin = in.readDouble(); st.numMax = in.readDouble()
    st.tsMin = in.readLong(); st.tsMax = in.readLong()
    val ntk = in.readInt()
    (0 until ntk).foreach { _ =>
      val k = readStr(in); st.topk.update(k, in.readLong())
    }
    if (in.readBoolean()) {
      st.hll = new Hll(); st.exact = null
      in.readFully(st.hll.regs)
    } else {
      val ne = in.readInt()
      (0 until ne).foreach(_ => st.exact.add(in.readLong()))
    }
    in.close()
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): ProfileAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ProfileAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): ProfileAggregate =
    copy(vstr = c(0), vnum = c(1), vts = c(2), vtag = c(3))
}

object ProfileAggregate {
  /** Column entry point over the 4 flatten value columns; group the
    * surrounding aggregation by `path`.
    */
  def profileAgg(vstr: Column, vnum: Column, vts: Column,
                 vtag: Column, exactLimit: Int = 100000,
                 topkCap: Int = PathStats.TopkCap): Column =
    Shims.column(ProfileAggregate(
      Shims.expression(vstr), Shims.expression(vnum),
      Shims.expression(vts), Shims.expression(vtag),
      exactLimit, topkCap).toAggregateExpression())
}

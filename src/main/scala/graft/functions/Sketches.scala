package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable sketch aggregates — the fixed-memory path for corpus
  * statistics at 100 TB, where exact per-group state (full value lists,
  * full item maps) would not fit an executor.
  *
  * Both are Catalyst `TypedImperativeAggregate`s, so Spark runs them
  * as ordinary two-phase aggregates: partial sketches on the map side,
  * binary-serialized into the shuffle, merged on the reduce side —
  * state per (group × sketch) is bounded by the sketch parameters, not
  * by the data.
  *
  *  - [[TDigestAgg]]: quantiles via a merging t-digest (Dunning & Ertl,
  *    arXiv:1902.04023). Sub-percent rank error at compression 100
  *    with ~centroids ≤ 2·compression doubles of state.
  *  - [[SpaceSavingAgg]]: heavy hitters via SpaceSaving (Metwally,
  *    Agrawal & El Abbadi 2005, "Efficient computation of frequent and
  *    top-k elements in data streams"). Guarantees every item with
  *    true frequency > N/capacity is retained; reports
  *    [count - maxErr, count] bounds per item.
  */
object Sketches {

  def tdigestQuantiles(value: Column, compression: Double, qs: Seq[Double]): Column =
    ColumnBridge.column(TDigestAgg(ColumnBridge.expression(value), compression, qs)
      .toAggregateExpression())

  def topkSketch(item: Column, capacity: Int, k: Int): Column =
    ColumnBridge.column(SpaceSavingAgg(ColumnBridge.expression(item), capacity, k)
      .toAggregateExpression())

  // ---------------------------------------------------------------- t-digest

  /** Centroid buffer: `n` live (mean, weight) pairs + an unsorted
    * append tail; compressed (sorted + k-scale merged) when the tail
    * fills or at serialize/eval time.
    */
  final class TDigest(val compression: Double) extends Serializable {
    // capacity: enough room that compression triggers rarely; the
    // merged prefix never exceeds ~2*compression centroids
    private val cap = math.max(64, (8 * compression).toInt)
    var means: Array[Double] = new Array[Double](cap)
    var weights: Array[Double] = new Array[Double](cap)
    var n: Int = 0            // merged prefix length
    var tail: Int = 0         // appended-but-unmerged suffix length
    var total: Double = 0.0

    private def kScale(q: Double): Double =
      compression / (2 * math.Pi) * math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)

    def add(x: Double, w: Double = 1.0): Unit = {
      if (n + tail == means.length) compress()
      means(n + tail) = x
      weights(n + tail) = w
      tail += 1
      total += w
    }

    def addAll(other: TDigest): Unit = {
      var i = 0
      while (i < other.n + other.tail) {
        add(other.means(i), other.weights(i))
        i += 1
      }
    }

    /** Sort all live centroids by mean and greedily merge neighbors
      * while the merged cluster stays within one k-unit of scale —
      * small clusters at the tails (accurate extreme quantiles), large
      * in the middle.
      */
    def compress(): Unit = {
      val live = n + tail
      if (live == 0) { n = 0; tail = 0; return }
      val idx = (0 until live).sortBy(means(_)).toArray
      val ms = idx.map(means(_))
      val ws = idx.map(weights(_))
      var out = 0
      var acc = 0.0                 // weight before the current cluster
      var cm = ms(0); var cw = ws(0)
      var kLo = kScale(0.0)
      var i = 1
      while (i < live) {
        val qHi = (acc + cw + ws(i)) / total
        if (kScale(qHi) - kLo <= 1.0) {
          // fold centroid i into the current cluster
          val w2 = cw + ws(i)
          cm = cm + (ms(i) - cm) * ws(i) / w2
          cw = w2
        } else {
          means(out) = cm; weights(out) = cw; out += 1
          acc += cw
          kLo = kScale(acc / total)
          cm = ms(i); cw = ws(i)
        }
        i += 1
      }
      means(out) = cm; weights(out) = cw; out += 1
      n = out
      tail = 0
    }

    /** Interpolated quantile: centroids are treated as mass centered
      * at their mean; linear interpolation between successive centroid
      * midpoints.
      */
    def quantile(q: Double): Double = {
      compress()
      if (n == 0) return Double.NaN
      if (n == 1) return means(0)
      val target = q * total
      var acc = 0.0
      var i = 0
      while (i < n) {
        val mid = acc + weights(i) / 2
        if (target < mid || i == n - 1) {
          if (i == 0 && target < weights(0) / 2) return means(0)
          if (i == n - 1 && target >= acc + weights(i) / 2) return means(n - 1)
          val prevMid = acc - weights(i - 1) / 2
          val frac = (target - prevMid) / (mid - prevMid)
          return means(i - 1) + frac * (means(i) - means(i - 1))
        }
        acc += weights(i)
        i += 1
      }
      means(n - 1)
    }

    def toBytes: Array[Byte] = {
      compress()
      val bb = ByteBuffer.allocate(8 + 4 + 16 * n)
      bb.putDouble(compression).putInt(n)
      var i = 0
      while (i < n) { bb.putDouble(means(i)).putDouble(weights(i)); i += 1 }
      bb.array()
    }
  }

  object TDigest {
    def fromBytes(bytes: Array[Byte]): TDigest = {
      val bb = ByteBuffer.wrap(bytes)
      val d = new TDigest(bb.getDouble)
      val k = bb.getInt
      var i = 0
      while (i < k) { d.add(bb.getDouble, bb.getDouble); i += 1 }
      d
    }
  }

  case class TDigestAgg(
      child: Expression,
      compression: Double,
      qs: Seq[Double],
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TDigest] {

    override def createAggregationBuffer(): TDigest = new TDigest(compression)

    override def update(buf: TDigest, input: InternalRow): TDigest = {
      val v = child.eval(input)
      if (v != null) buf.add(v match {
        case d: Double => d
        case f: Float => f.toDouble
        case l: Long => l.toDouble
        case i: Int => i.toDouble
        case d: java.math.BigDecimal => d.doubleValue()
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case o => o.toString.toDouble
      })
      buf
    }

    override def merge(a: TDigest, b: TDigest): TDigest = { a.addAll(b); a }

    override def eval(buf: TDigest): Any =
      new GenericArrayData(qs.map(buf.quantile).toArray)

    override def serialize(buf: TDigest): Array[Byte] = buf.toBytes
    override def deserialize(bytes: Array[Byte]): TDigest = TDigest.fromBytes(bytes)

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c.head)
    override def withNewMutableAggBufferOffset(o: Int): TDigestAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): TDigestAgg =
      copy(inputAggBufferOffset = o)
    override def prettyName: String = "tdigest_quantiles"
  }

  // ------------------------------------------------------------ SpaceSaving

  /** SpaceSaving counter table: at most `capacity` (item → (count,
    * err)) entries. On overflow the minimum-count entry is evicted and
    * the newcomer inherits its count as error bound.
    */
  final class SpaceSaving(val capacity: Int) extends Serializable {
    val counts = new java.util.HashMap[String, Array[Long]]() // (count, err)

    def add(item: String, w: Long = 1L, err: Long = 0L): Unit = {
      val cur = counts.get(item)
      if (cur != null) { cur(0) += w; cur(1) += err; return }
      if (counts.size < capacity) { counts.put(item, Array(w, err)); return }
      // evict the minimum-count entry (deterministic tie-break: the
      // lexicographically smallest item), inherit its count as error
      var minItem: String = null
      var minCount = Long.MaxValue
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue()(0)
        if (c < minCount || (c == minCount && (minItem == null || e.getKey < minItem))) {
          minCount = c; minItem = e.getKey
        }
      }
      counts.remove(minItem)
      counts.put(item, Array(minCount + w, minCount + err))
    }

    def mergeIn(other: SpaceSaving): Unit = {
      val it = other.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        add(e.getKey, e.getValue()(0), e.getValue()(1))
      }
    }

    /** Top-k by estimated count desc, then item asc (deterministic). */
    def topK(k: Int): Seq[(String, Long, Long)] = {
      import scala.jdk.CollectionConverters._
      counts.entrySet().asScala.toSeq
        .map(e => (e.getKey, e.getValue()(0), e.getValue()(1)))
        .sortBy { case (item, c, _) => (-c, item) }
        .take(k)
    }
  }

  case class SpaceSavingAgg(
      child: Expression,
      capacity: Int,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSaving] {

    override def createAggregationBuffer(): SpaceSaving = new SpaceSaving(capacity)

    override def update(buf: SpaceSaving, input: InternalRow): SpaceSaving = {
      val v = child.eval(input)
      if (v != null) buf.add(v.toString)
      buf
    }

    override def merge(a: SpaceSaving, b: SpaceSaving): SpaceSaving = { a.mergeIn(b); a }

    /** array<struct<item, count_hi, count_lo>>: count_hi is the
      * SpaceSaving estimate (an over-count), count_lo = count_hi - err
      * the guaranteed minimum true count.
      */
    override def eval(buf: SpaceSaving): Any =
      new GenericArrayData(buf.topK(k).map { case (item, c, err) =>
        InternalRow(UTF8String.fromString(item), c, c - err)
      }.toArray[Any])

    override def serialize(buf: SpaceSaving): Array[Byte] = {
      val entries = buf.topK(buf.counts.size())
      val bytes = entries.map { case (s, _, _) => s.getBytes("UTF-8") }
      val bb = ByteBuffer.allocate(8 + entries.map(_ => 20).sum + bytes.map(_.length).sum)
      bb.putInt(buf.capacity).putInt(entries.size)
      entries.zip(bytes).foreach { case ((_, c, err), b) =>
        bb.putInt(b.length)
        bb.put(b)
        bb.putLong(c).putLong(err)
      }
      bb.array()
    }

    override def deserialize(bytesIn: Array[Byte]): SpaceSaving = {
      val bb = ByteBuffer.wrap(bytesIn)
      val s = new SpaceSaving(bb.getInt)
      val sz = bb.getInt
      var i = 0
      while (i < sz) {
        val len = bb.getInt
        val b = new Array[Byte](len)
        bb.get(b)
        val c = bb.getLong
        val err = bb.getLong
        s.add(new String(b, "UTF-8"), c, err)
        i += 1
      }
      s
    }

    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count_hi", LongType, nullable = false),
      StructField("count_lo", LongType, nullable = false))), containsNull = false)
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c.head)
    override def withNewMutableAggBufferOffset(o: Int): SpaceSavingAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): SpaceSavingAgg =
      copy(inputAggBufferOffset = o)
    override def prettyName: String = "topk_sketch"
  }

  // ------------------------------------------------------------ HyperLogLog

  /** Distinct-count estimate via classic HyperLogLog (Flajolet, Fusy,
    * Gandouet & Meunier 2007, "HyperLogLog: the analysis of a
    * near-optimal cardinality estimation algorithm") with the paper's
    * small-range linear-counting correction. The reference exposes the
    * same capability through its incremental-agg runtime
    * (internal/xsql/funcs_agg.go count distinct path) but keeps exact
    * per-group sets; the sketch is the 100 TB form: 2^p byte registers
    * per group regardless of cardinality, and register-max merge is
    * ORDER-INDEPENDENT, so results are bit-deterministic at any
    * partition count — unlike every other floating aggregate here.
    *
    * `item` is hashed with xxhash64 at the column layer; the aggregate
    * consumes the 64-bit hash directly (top p bits → register, leading
    * zeros of the rest → rank).
    */
  def hllDistinct(item: Column, p: Int = 14): Column = {
    require(p >= 4 && p <= 18, s"hll precision $p outside [4,18]")
    // hash only non-null inputs: xxhash64(null) is the (non-null) seed,
    // which would count NULL as one extra distinct and diverge from
    // count(DISTINCT) semantics; the null passes through `when` and is
    // skipped by the aggregate's null check
    import org.apache.spark.sql.functions.{when, xxhash64}
    ColumnBridge.column(HllAgg(
      ColumnBridge.expression(when(item.isNotNull, xxhash64(item))), p)
      .toAggregateExpression())
  }

  final class Hll(val p: Int) extends Serializable {
    val m: Int = 1 << p
    val regs: Array[Byte] = new Array[Byte](m)

    def add(h: Long): Unit = {
      val idx = (h >>> (64 - p)).toInt
      val rest = h << p
      val rank = (if (rest == 0) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
      if (rank > regs(idx)) regs(idx) = rank.toByte
    }

    def mergeIn(o: Hll): Unit = {
      var i = 0
      while (i < m) { if (o.regs(i) > regs(i)) regs(i) = o.regs(i); i += 1 }
    }

    def estimate: Long = {
      var sum = 0.0; var zeros = 0; var i = 0
      while (i < m) {
        val r = regs(i)
        sum += 1.0 / (1L << r)
        if (r == 0) zeros += 1
        i += 1
      }
      val alpha = m match {
        case 16 => 0.673
        case 32 => 0.697
        case 64 => 0.709
        case _  => 0.7213 / (1 + 1.079 / m)
      }
      val e = alpha * m * m / sum
      val corrected =
        if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
      math.round(corrected)
    }
  }

  case class HllAgg(
      child: Expression,
      p: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Hll] {

    override def createAggregationBuffer(): Hll = new Hll(p)

    override def update(buf: Hll, input: InternalRow): Hll = {
      val v = child.eval(input)
      if (v != null) buf.add(v.asInstanceOf[Long])
      buf
    }

    override def merge(a: Hll, b: Hll): Hll = { a.mergeIn(b); a }

    override def eval(buf: Hll): Any = buf.estimate

    override def serialize(buf: Hll): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + buf.m)
      bb.putInt(buf.p)
      bb.put(buf.regs)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Hll = {
      val bb = ByteBuffer.wrap(bytes)
      val h = new Hll(bb.getInt)
      bb.get(h.regs)
      h
    }

    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c.head)
    override def withNewMutableAggBufferOffset(o: Int): HllAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): HllAgg =
      copy(inputAggBufferOffset = o)
    override def prettyName: String = "hll_distinct"
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** ClickHouse `windowFunnel(window)(ts, cond1, …, condN)` as a real
  * SQL aggregate — the fourth custom UDAF (after [[FreqTopK]],
  * [[KllSketchAgg]], [[MapCombineAgg]]).
  *
  * Same semantics as the relational [[graft.operators.Funnel]] (gate
  * r29): deepest step K such that some chain of events matching
  * conds 1…K occurs in NON-DECREASING time order within `windowSec`
  * seconds (truncated-seconds difference, matching `unix_timestamp`
  * arithmetic) of the chain's first event. Non-decreasing is
  * ClickHouse's default — two steps may share a timestamp (and one
  * event matching consecutive conditions may satisfy both, exactly as
  * CH's per-(timestamp, condition) event entries chain at equal time);
  * `strictIncrease = true` is the `'strict_increase'` mode, requiring
  * every step strictly later than the previous. CH's own
  * implementation buffers the group's qualifying events in memory and
  * resolves the funnel at finalization; so does this one — the buffer
  * carries only events matching at least one condition, as (micros,
  * condition-bitmask) pairs, 12 bytes each, and partials concatenate
  * on merge. Per-group state is bounded by that user's MATCHING
  * events — the same bound CH accepts for this aggregate (the
  * relational Funnel operator remains the spelling of choice when
  * per-user histories are pathological).
  *
  * Finalization is the operator's greedy chain walk, exact per chain
  * start (earliest valid next event minimizes every later timestamp):
  * level-1 chains start at each cond1 event; each step advances every
  * live chain to the earliest strictly-later matching event via one
  * two-pointer merge scan over the time-sorted buffer — O(N·n) per
  * group, no quadratic pairing.
  */
case class WindowFunnelAgg(windowSec: Long, ts: Expression,
    conds: Seq[Expression], countChains: Boolean = false,
    strictIncrease: Boolean = false,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[
      scala.collection.mutable.ArrayBuffer[(Long, Int)]] {

  require(conds.nonEmpty && conds.length <= 32,
    "windowFunnel: 1..32 step conditions")

  private type Buf = scala.collection.mutable.ArrayBuffer[(Long, Int)]

  override def createAggregationBuffer(): Buf = new Buf()

  /** event time in MICROS — TIMESTAMP and TIMESTAMP_NTZ evaluate to
    * micros Longs already, DATE to days, numerics to epoch seconds
    */
  private def micros(v: Any): Long = (v, ts.dataType) match {
    case (l: Long, TimestampType | TimestampNTZType) => l
    case (d: Int, DateType) => d * 86400L * 1000000L
    case (l: Long, _) => l * 1000000L
    case (i: Int, _) => i * 1000000L
    case (other, dt) => throw new IllegalArgumentException(
      s"windowFunnel: unsupported ts value $other of type $dt")
  }

  override def update(buf: Buf, row: InternalRow): Buf = {
    val t = ts.eval(row)
    if (t != null) {
      var mask = 0; var i = 0
      while (i < conds.length) {
        if (conds(i).eval(row) == true) mask |= (1 << i)
        i += 1
      }
      if (mask != 0) buf += ((micros(t), mask))
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = { buf ++= other; buf }

  /** sequenceCount mode: greedy left-to-right scan counting DISJOINT
    * ordered chains (earliest-completion-first maximizes the number
    * of disjoint subsequence matches — the exchange argument: any
    * solution can be rewritten to end its first chain no later).
    */
  private def countDisjointChains(evs: Array[(Long, Int)]): Int = {
    var count = 0; var level = 0; var lastTs = Long.MinValue
    evs.foreach { case (t, mask) =>
      val ordered = level == 0 ||
        (if (strictIncrease) t > lastTs else t >= lastTs)
      if ((mask & (1 << level)) != 0 && ordered) {
        level += 1; lastTs = t
        if (level == conds.length) { count += 1; level = 0 }
      }
    }
    count
  }

  override def eval(buf: Buf): Any = {
    if (buf.isEmpty) return 0
    val evs = buf.sortBy(_._1).toArray
    if (countChains) return countDisjointChains(evs)
    // truncated-seconds window — the Funnel contract. Step ordering is
    // non-decreasing by default (CH), strictly-after under
    // strict_increase.
    def sec(m: Long) = Math.floorDiv(m, 1000000L)
    // level-1 chains: (start, last) at each cond1 event
    var chains = evs.filter(e => (e._2 & 1) != 0).map(e => (e._1, e._1))
    if (chains.isEmpty) return 0
    var level = 1
    var step = 1
    while (step < conds.length && chains.nonEmpty) {
      val nxt = evs.filter(e => (e._2 & (1 << step)) != 0).map(_._1)
      // chains stay sorted by last (earliest-next is monotone), so one
      // forward pointer over nxt serves every chain
      var j = 0
      val advanced =
        new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      chains.foreach { case (start, last) =>
        while (j < nxt.length &&
          (if (strictIncrease) nxt(j) <= last else nxt(j) < last)) j += 1
        if (j < nxt.length && sec(nxt(j)) - sec(start) <= windowSec)
          advanced += ((start, nxt(j)))
      }
      chains = advanced.toArray
      if (chains.nonEmpty) level = step + 1
      step += 1
    }
    level
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 12)
    buf.foreach { case (t, m) => bb.putLong(t); bb.putInt(m) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Buf()
    while (bb.remaining() >= 12) buf += ((bb.getLong, bb.getInt))
    buf
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = ts +: conds
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ts = newChildren.head, conds = newChildren.tail.toSeq)
  override def withNewMutableAggBufferOffset(newOffset: Int): WindowFunnelAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WindowFunnelAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "windowFunnel"
}

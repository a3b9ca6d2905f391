package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Single-pass windowed-funnel walk over ONE user's time-sorted event
  * array: the deadline-pruned replacement for the nested
  * (starts × events) fold flagged in the round-7 review.
  *
  * Semantics are IDENTICAL to evaluating every candidate start
  * independently (the first `maxStarts` step-1 events, each walked
  * through the earliest-strictly-increasing recurrence bounded by
  * start + window, deepest stage winning, ties to the earliest
  * start): because events arrive sorted, every live chain at stage
  * `s` with tip strictly before an incoming step-`s+1` event advances
  * on it TOGETHER — after which they share that event's timestamp as
  * their new tip. So live starts collapse into per-stage GROUPS
  * (shared tip, ascending start times), an event advances or expires
  * whole groups, and each start is touched O(steps) times total:
  * O(|events| + |starts|·|steps|) instead of |starts|·|events|.
  *
  * Input: `array<struct<ts, step:int>>` SORTED ascending (ts, step),
  * `ts` physically long-backed (timestamp micros or bigint); `step`
  * in [1, numSteps]. `windowUnits` is the conversion deadline in the
  * ts column's own units. Output: `struct<stage:int, t_first, t_last>`
  * with stage 0 / null times when the user has no step-1 event.
  *
  * One eval per USER (not per event) behind the grouped collect, so
  * interpreted evaluation (CodegenFallback) costs one virtual call
  * per group row — the walk itself is a tight primitive loop.
  */
case class FunnelWalk(child: Expression, windowUnits: Long, maxStarts: Int,
                      numSteps: Int)
  extends UnaryExpression with CodegenFallback {

  require(windowUnits > 0, "windowUnits must be positive")
  require(maxStarts >= 1, "maxStarts must be >= 1")
  require(numSteps >= 1, "numSteps must be >= 1")

  private lazy val tsType: DataType = child.dataType match {
    case ArrayType(s: StructType, _) => s.fields(0).dataType
    case other => other // checkInputDataTypes rejects before use
  }

  override def dataType: DataType = StructType(Seq(
    StructField("stage", IntegerType, nullable = false),
    StructField("t_first", tsType),
    StructField("t_last", tsType)))

  override def nullable: Boolean = false
  override def prettyName: String = "graft_funnel_walk"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.fields.length == 2 &&
        (s.fields(0).dataType match {
          case TimestampType | TimestampNTZType | LongType => true
          case _ => false
        }) && s.fields(1).dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<ts: timestamp|bigint, step: int>>, " +
        s"got ${other.simpleString}")
  }

  // a group of live starts sharing one chain tip; t0s ascending
  private final class Group(val tLast: Long,
                            val t0s: scala.collection.mutable.ArrayBuffer[Long])

  override def eval(input: InternalRow): Any = {
    val zero = new GenericInternalRow(Array[Any](0, null, null))
    val raw = child.eval(input)
    if (raw == null) return zero
    val a = raw.asInstanceOf[ArrayData]
    val n = a.numElements()
    // stages(s) = groups of live starts currently at stage s, ordered
    // by ascending tip (and ascending start ranges — groups only ever
    // append in event order)
    val stages = Array.fill(numSteps + 1)(
      new java.util.ArrayDeque[Group]())
    var started = 0
    var bestStage = 0
    var bestT0 = 0L
    var bestTLast = 0L
    // deepest stage wins; ties keep the EARLIEST start — exactly the
    // per-start sweep's earliest-first, strictly-deeper-replaces rule
    def offer(stage: Int, t0: Long, tLast: Long): Unit =
      if (stage > bestStage || (stage == bestStage && t0 < bestT0)) {
        bestStage = stage; bestT0 = t0; bestTLast = tLast
      }
    var i = 0
    while (i < n) {
      val e = a.getStruct(i, 2)
      val ts = e.getLong(0)
      val step = e.getInt(1)
      if (step >= 2) {
        val src = stages(step - 1)
        // every group whose tip is strictly before this event either
        // advances (start still inside its window) or expires for good
        // (later events are later still) — groups tied at ts stay put
        var adv: scala.collection.mutable.ArrayBuffer[Long] = null
        while (!src.isEmpty && src.peekFirst().tLast < ts) {
          val g = src.pollFirst()
          var j = 0
          val m = g.t0s.length
          while (j < m) {
            val t0 = g.t0s(j)
            if (t0 + windowUnits < ts) offer(step - 1, t0, g.tLast)
            else {
              if (adv == null) adv = new scala.collection.mutable.ArrayBuffer[Long]
              adv += t0
            }
            j += 1
          }
        }
        if (adv != null) stages(step).addLast(new Group(ts, adv))
      } else if (started < maxStarts) {
        started += 1
        val tail = stages(1).peekLast()
        if (tail != null && tail.tLast == ts) tail.t0s += ts
        else stages(1).addLast(new Group(ts,
          scala.collection.mutable.ArrayBuffer(ts)))
      }
      i += 1
    }
    var s = 1
    while (s <= numSteps) {
      val it = stages(s).iterator()
      while (it.hasNext) {
        val g = it.next()
        var j = 0
        while (j < g.t0s.length) { offer(s, g.t0s(j), g.tLast); j += 1 }
      }
      s += 1
    }
    if (bestStage == 0) zero
    else new GenericInternalRow(Array[Any](bestStage, bestT0, bestTLast))
  }

  override protected def withNewChildInternal(newChild: Expression): FunnelWalk =
    copy(child = newChild)
}

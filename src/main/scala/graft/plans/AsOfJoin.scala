package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, ClusteredDistribution, Distribution,
  IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.{DateType, DataType, IntegerType,
  LongType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Native as-of join — the whole-operator Catalyst extension path
  * (LogicalPlan node → SparkStrategy → SparkPlan) reserved for semantics
  * the built-in operators can only express wastefully.
  *
  * The DataFrame form of a backward as-of join (q41) is
  * `left ⟕ right ON key ∧ rtime ≤ ltime` followed by `row_number = 1`:
  * the join MATERIALIZES every (event, earlier-order) pair — O(Σ per-key
  * n·m) rows — only for the window to throw all but one away
  * (WindowGroupLimit bounds the state, not the join's output). The
  * sorted-merge form below never builds that intermediate: both sides
  * arrive clustered by key and sorted by (key, time) — the exact layout
  * a sort-merge equi-join would demand anyway — and one forward sweep
  * emits each left row joined to its as-of match, O(n + m) per
  * partition with one retained right row of state. This is how the
  * time-series engines that own this operator (kdb, QuestDB, Flink
  * temporal joins) execute it.
  *
  * Winner semantics per direction (the three knobs kdb's `aj`, pandas
  * `merge_asof` and Flink temporal joins expose):
  *  - `backward` (default): the right row maximizing (rightTime,
  *    rightTie) among rows with rightTime ≤ leftTime — identical to
  *    q41's `row_number() over (order by time desc, tie desc) = 1`.
  *    Because the right side is sorted (key, time, tie) ascending,
  *    "last row seen with time ≤ t" IS that maximum.
  *  - `forward`: the right row minimizing (rightTime, rightTie) among
  *    rows with rightTime ≥ leftTime — the first not-yet-consumed right
  *    row of the sweep, so it needs no state at all.
  *  - `nearest`: whichever of the backward/forward candidates is
  *    closer in time; equal distance prefers backward (the pandas
  *    convention would pick either; fixing backward keeps the result
  *    deterministic and SQL-expressible).
  * An optional `tolerance` (raw units of the time columns: µs for
  * timestamps, days for dates) bounds |leftTime − rightTime|; a
  * candidate outside it leaves the left row unmatched. Because the
  * backward candidate is the LATEST time ≤ t and the forward one the
  * EARLIEST ≥ t, tolerance never needs to look past them.
  *
  * Time/tie columns are restricted to integral/timestamp/date types
  * (the as-of domain) so the hot loop compares primitive longs; key
  * columns additionally admit strings (kdb's `aj` takes symbols), which
  * compare as UTF8String binary — no caller-side dictionary encoding
  * needed. The two time columns (and each key pair) must share a
  * physical unit — checked at plan-build time by [[AsOf.join]]. */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression,
    direction: String = "backward",
    tolerance: Option[Long] = None,
    broadcastRight: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: [[AsOfJoin]] → [[AsOfJoinExec]] (sorted-merge) or
  * [[BroadcastAsOfJoinExec]] (map-side binary search). Injected via
  * `GraftExtensions.injectPlannerStrategy`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lks, rks, lt, rt, tie, dir, tol, bcast) =>
      if (bcast)
        BroadcastAsOfJoinExec(lks, rks, lt, rt, tie, dir, tol,
          planLater(l), planLater(r)) :: Nil
      else
        AsOfJoinExec(lks, rks, lt, rt, tie, dir, tol,
          planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical sorted-merge as-of join. `requiredChildDistribution` asks the
  * planner to cluster both sides on the key (EnsureRequirements inserts
  * co-partitioned exchanges exactly as for a shuffled equi-join);
  * `requiredChildOrdering` asks for the (key, time[, tie]) sort. The
  * operator itself is then a zipPartitions two-pointer sweep holding ONE
  * copied right row — no join buffer, no window state, no codegen needed
  * because the per-row work is four primitive reads. */
case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression,
    direction: String, tolerance: Option[Long],
    left: SparkPlan, right: SparkPlan)
  extends SparkPlan with BinaryExecNode {

  override lazy val metrics =
    Map("numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
      "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of matched rows"))

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  // rows are emitted in the left child's order, so a downstream sort on
  // (keys..., time) — e.g. a per-key window right after the join — is
  // elided
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(leftKeys.map(SortOrder(_, Ascending)) :+
        SortOrder(leftTime, Ascending),
      rightKeys.map(SortOrder(_, Ascending)) ++
        Seq(SortOrder(rightTime, Ascending), SortOrder(rightTie, Ascending)))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val outRows = longMetric("numOutputRows")
    val matched = longMetric("numMatched")
    val lKeyBs = leftKeys.map(BindReferences.bindReference(_, left.output))
      .toArray
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyBs = rightKeys.map(BindReferences.bindReference(_, right.output))
      .toArray
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val nKeys = lKeyBs.length
    val nRight = right.output.length
    val leftAttrs = left.output
    val rightAttrs = right.output
    // backward/nearest consume rows with rt == lt into the backward
    // candidate (max tie wins); forward must stop there instead (min tie
    // wins among rt ≥ lt, and the stop row is exactly that minimum)
    val isForward = direction == "forward"
    val needBackward = direction != "forward"
    val tol = tolerance.getOrElse(Long.MaxValue)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      // nullability must widen on the INPUT schema too: bindReference
      // takes nullable from the input attribute, and a non-nullable right
      // column (e.g. a CASE..ELSE literal) read from the null-filled row
      // would otherwise skip the null check and NPE on strings
      val outAttrs = (leftAttrs ++ rightAttrs).map(_.withNullability(true))
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      var cand: InternalRow = null
      val candKey = new Array[AnyRef](nKeys)
      var candValid = false
      var candTime = 0L
      val lKey = new Array[AnyRef](nKeys)
      val rKey = new Array[AnyRef](nKeys)
      def advance(): Unit =
        rRow = if (rIter.hasNext) rIter.next() else null
      /** Evaluate a composite key into `out`; false if any part is null.
        * Values are normalized (int → boxed long, strings stay
        * UTF8String) so cross-side compares are type-stable. */
      def evalKeys(bs: Array[Expression], row: InternalRow,
                   out: Array[AnyRef]): Boolean = {
        var i = 0
        while (i < nKeys) {
          val v = bs(i).eval(row)
          if (v == null) return false
          out(i) = AsOf.normKey(v)
          i += 1
        }
        true
      }
      /** Lexicographic compare of two evaluated composite keys. */
      def cmpKeys(a: Array[AnyRef], b: Array[AnyRef]): Int = {
        var i = 0
        while (i < nKeys) {
          val c = AsOf.cmpKey(a(i), b(i))
          if (c != 0) return c
          i += 1
        }
        0
      }
      new Iterator[InternalRow] {
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          outRows += 1
          val lt = lTimeB.eval(l)
          if (!evalKeys(lKeyBs, l, lKey) || lt == null)
            return proj(joined(l, nullRight))
          val ltL = AsOf.toL(lt)
          if (candValid && cmpKeys(candKey, lKey) != 0) {
            cand = null; candValid = false
          }
          var scanning = true
          while (scanning && rRow != null) {
            val rt = rTimeB.eval(rRow)
            if (!evalKeys(rKeyBs, rRow, rKey) || rt == null)
              advance() // nulls-first: null keys/times never match
            else {
              val kc = cmpKeys(rKey, lKey)
              val consumes = kc == 0 &&
                (if (isForward) AsOf.toL(rt) < ltL else AsOf.toL(rt) <= ltL)
              if (kc < 0) { cand = null; candValid = false; advance() }
              else if (consumes) {
                // sorted (keys, time, tie) asc ⇒ last seen = max (time, tie)
                if (needBackward) {
                  cand = rRow.copy()
                  var i = 0
                  while (i < nKeys) { // own the key: a UTF8String may point
                    candKey(i) = AsOf.ownKey(rKey(i)) // into the reused row
                    i += 1
                  }
                  candValid = true
                  candTime = AsOf.toL(rt)
                }
                advance()
              } else scanning = false
            }
          }
          // the stop row (if same key) is the forward candidate: the
          // minimum (time, tie) among rows with rt ≥ lt (forward) or
          // rt > lt (nearest)
          var fwdTime = 0L
          var fwdOk = false
          if (!needBackward || direction == "nearest") {
            if (rRow != null) {
              val rt = rTimeB.eval(rRow)
              if (rt != null && evalKeys(rKeyBs, rRow, rKey) &&
                  cmpKeys(rKey, lKey) == 0) {
                fwdTime = AsOf.toL(rt); fwdOk = true
              }
            }
          }
          val bwOk = needBackward && cand != null && ltL - candTime <= tol
          val fOk = fwdOk && fwdTime - ltL <= tol
          val m: InternalRow = direction match {
            case "forward" => if (fOk) rRow else null
            case "nearest" =>
              if (bwOk && fOk) {
                if (ltL - candTime <= fwdTime - ltL) cand else rRow
              } else if (bwOk) cand else if (fOk) rRow else null
            case _ => if (bwOk) cand else null
          }
          if (m != null) matched += 1
          proj(joined(l, if (m != null) m else nullRight))
        }
      }
    }
  }
}

/** Map-side as-of join against a BROADCAST right side — the strategy for
  * the reference-table shape (currency rates, config epochs, dimension
  * versions): the sorted-merge exec shuffles BOTH sides on the key, so a
  * 100 TB probe stream pays a full exchange + sort to join a right side
  * of a few thousand rows. Here the right side broadcasts once
  * (EnsureRequirements inserts the BroadcastExchange from the declared
  * BroadcastDistribution), each task builds the per-key sorted time index
  * from it, and every left row resolves by binary search — zero probe
  * shuffle, zero probe sort, left partitioning and ordering preserved.
  * Same winner semantics as [[AsOfJoinExec]], all three directions plus
  * tolerance (AsOfJoinSpec pins equality operator-vs-operator). */
case class BroadcastAsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression,
    direction: String, tolerance: Option[Long],
    left: SparkPlan, right: SparkPlan)
  extends SparkPlan with BinaryExecNode {

  override lazy val metrics = Map(
    "numOutputRows" ->
      SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" ->
      SQLMetrics.createMetric(sparkContext, "number of matched rows"),
    "indexRows" ->
      SQLMetrics.createMetric(sparkContext, "broadcast index rows"),
    "indexBuildTime" ->
      SQLMetrics.createTimingMetric(sparkContext, "index build time"))

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  // the probe side is never moved or re-sorted — that is the point
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val outRows = longMetric("numOutputRows")
    val matched = longMetric("numMatched")
    val indexRows = longMetric("indexRows")
    val indexBuildTime = longMetric("indexBuildTime")
    val lKeyBs = leftKeys.map(BindReferences.bindReference(_, left.output))
      .toArray
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyBs = rightKeys.map(BindReferences.bindReference(_, right.output))
      .toArray
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val rTieB = BindReferences.bindReference(rightTie, right.output)
    val nKeys = lKeyBs.length
    val nRight = right.output.length
    val leftAttrs = left.output
    val rightAttrs = right.output
    val isForward = direction == "forward"
    val isNearest = direction == "nearest"
    val tol = tolerance.getOrElse(Long.MaxValue)
    // "right side is small by contract" is enforced, not assumed: past
    // this many rows the index build (and the IdentityBroadcastMode array
    // before it) is the wrong strategy — fail loudly toward the merge exec
    val maxIndexRows = conf.getConfString(
      AsOf.BROADCAST_MAX_ROWS_KEY, AsOf.BROADCAST_MAX_ROWS_DEFAULT.toString)
      .toLong
    val planId = id
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions({ lIter =>
      def keyOf(bs: Array[Expression], row: InternalRow)
          : Option[Vector[Any]] = {
        val out = Vector.newBuilder[Any]
        var i = 0
        while (i < nKeys) {
          val v = bs(i).eval(row)
          if (v == null) return None
          out += AsOf.normKey(v)
          i += 1
        }
        Some(out.result())
      }
      // per-EXECUTOR index (memoized on the broadcast value identity +
      // plan id): composite key → rows sorted by (time, tie). Without the
      // cache every task repeats the O(m log m) sort over the broadcast
      // rows; with it the build runs once per executor per broadcast.
      val index = AsOfIndexCache.getOrBuild(broadcastRows.value, planId) {
        val t0 = System.nanoTime()
        val rows = broadcastRows.value
        require(rows.length <= maxIndexRows,
          s"broadcast as-of right side has ${rows.length} rows, over the " +
            s"${AsOf.BROADCAST_MAX_ROWS_KEY}=$maxIndexRows guard: the " +
            "right side must be a bounded reference table — use the " +
            "sorted-merge strategy (broadcastRight=false) for large sides")
        val built =
          new java.util.HashMap[Vector[Any], Array[(Long, Long, InternalRow)]]
        val staging =
          new java.util.HashMap[Vector[Any],
            scala.collection.mutable.ArrayBuffer[(Long, Long, InternalRow)]]
        rows.foreach { r =>
          val k = keyOf(rKeyBs, r)
          val t = rTimeB.eval(r)
          if (k.isDefined && t != null) { // nulls never match, as in the sweep
            val tie = rTieB.eval(r)
            val tieL = if (tie == null) Long.MinValue else AsOf.toL(tie)
            staging.computeIfAbsent(k.get,
              _ => scala.collection.mutable.ArrayBuffer.empty)
              .append((AsOf.toL(t), tieL, r))
          }
        }
        staging.forEach { (k, buf) =>
          built.put(k, buf.sortBy(x => (x._1, x._2)).toArray)
        }
        indexRows += built.values().stream().mapToLong(_.length.toLong).sum()
        indexBuildTime += (System.nanoTime() - t0) / 1000000L
        built
      }
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      // nullability must widen on the INPUT schema too: bindReference
      // takes nullable from the input attribute, and a non-nullable right
      // column (e.g. a CASE..ELSE literal) read from the null-filled row
      // would otherwise skip the null check and NPE on strings
      val outAttrs = (leftAttrs ++ rightAttrs).map(_.withNullability(true))
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      lIter.map { l =>
        outRows += 1
        val lk = keyOf(lKeyBs, l)
        val lt = lTimeB.eval(l)
        var m: InternalRow = null
        if (lk.isDefined && lt != null) {
          val arr = index.get(lk.get)
          if (arr != null) {
            val ltL = AsOf.toL(lt)
            // first index with time > ltL (backward boundary);
            // equivalently: forward candidates start at the first index
            // with time ≥ ltL
            var lo = 0
            var hi = arr.length
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (arr(mid)._1 <= ltL) lo = mid + 1 else hi = mid
            }
            val bwIdx = lo - 1 // last time ≤ ltL (max tie: sorted asc)
            // forward: first time ≥ ltL — step back over equal times to
            // their FIRST occurrence (min tie wins, mirror of backward)
            var fwIdx = lo
            if (isForward) {
              var i = lo - 1
              while (i >= 0 && arr(i)._1 == ltL) { fwIdx = i; i -= 1 }
            }
            val bwOk = !isForward && bwIdx >= 0 &&
              ltL - arr(bwIdx)._1 <= tol
            val fwOk = (isForward || isNearest) && fwIdx < arr.length &&
              arr(fwIdx)._1 - ltL <= tol
            m =
              if (isForward) { if (fwOk) arr(fwIdx)._3 else null }
              else if (isNearest) {
                if (bwOk && fwOk) {
                  if (ltL - arr(bwIdx)._1 <= arr(fwIdx)._1 - ltL)
                    arr(bwIdx)._3
                  else arr(fwIdx)._3
                } else if (bwOk) arr(bwIdx)._3
                else if (fwOk) arr(fwIdx)._3 else null
              } else { if (bwOk) arr(bwIdx)._3 else null }
          }
        }
        if (m != null) matched += 1
        proj(joined(l, if (m != null) m else nullRight))
      }
    }, preservesPartitioning = true)
  }
}

/** Per-executor memo of built broadcast as-of indexes, keyed on the
  * IDENTITY of the broadcast value array (so a re-broadcast builds fresh)
  * plus the plan id (two different as-of execs may consume one broadcast
  * with different key/time bindings). WeakHashMap on the array: when the
  * broadcast block is dropped and its row array collected, the entry —
  * and the index holding references into it — goes with it. */
private[plans] object AsOfIndexCache {
  private val cache = new java.util.WeakHashMap[
    AnyRef, java.util.concurrent.ConcurrentHashMap[Int, AnyRef]]
  def getOrBuild[T <: AnyRef](rows: AnyRef, planId: Int)(build: => T): T = {
    val per = cache.synchronized {
      var m = cache.get(rows)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[Int, AnyRef]()
        cache.put(rows, m)
      }
      m
    }
    per.computeIfAbsent(planId, _ => build).asInstanceOf[T]
  }
}

/** Public API over the native operator. */
object AsOf {
  private val okTimeTypes: Set[DataType] =
    Set(LongType, IntegerType, TimestampType, DateType)
  private val okKeyTypes: Set[DataType] = okTimeTypes + StringType
  private val okDirections = Set("backward", "forward", "nearest")

  /** Row-count guard on the broadcast strategy's right side (override via
    * this SQL conf): past it [[BroadcastAsOfJoinExec]] fails loudly
    * instead of building a driver-size index — the merge strategy is the
    * right plan for a data-proportional right side. */
  val BROADCAST_MAX_ROWS_KEY = "graft.asof.broadcastMaxRows"
  val BROADCAST_MAX_ROWS_DEFAULT = 10000000L

  /** Raw physical value of an as-of time/tie (µs, days, or the
    * integral itself) — the execs' hot loops compare these as longs. */
  private[plans] def toL(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.longValue()
    case other => throw new IllegalStateException(
      s"as-of join key/time must evaluate to a long/int, got $other")
  }

  /** Normalized key value: integrals widen to boxed long (so int-vs-long
    * pairs compare equal), strings stay UTF8String (binary order). */
  private[plans] def normKey(v: Any): AnyRef = v match {
    case i: java.lang.Integer => java.lang.Long.valueOf(i.longValue())
    case other => other.asInstanceOf[AnyRef]
  }

  /** Compare two normalized key values of the same family. */
  private[plans] def cmpKey(a: AnyRef, b: AnyRef): Int = a match {
    case l: java.lang.Long =>
      java.lang.Long.compare(l, b.asInstanceOf[java.lang.Long])
    case s: UTF8String => s.compareTo(b.asInstanceOf[UTF8String])
    case other => throw new IllegalStateException(
      s"as-of join key must normalize to long/UTF8String, got $other")
  }

  /** Take ownership of a normalized key value that may point into a
    * reused row buffer (UTF8String over an UnsafeRow): clone strings,
    * boxed longs are immutable already. */
  private[plans] def ownKey(v: AnyRef): AnyRef = v match {
    case s: UTF8String => s.clone()
    case other => other
  }

  /** The physical-unit family of a column: the sweep compares raw
    * physical values (µs for timestamps, days for dates, the value
    * itself for integrals), so a cross-side pair must share a family or
    * the comparison is silently meaningless (µs vs days). Int vs Long is
    * fine — both are the raw value, widened. Strings only ever pair with
    * strings. */
  private def unitFamily(dt: DataType): String = dt match {
    case TimestampType => "timestamp (epoch-µs)"
    case DateType => "date (epoch-days)"
    case StringType => "string (binary order)"
    case _ => "integral"
  }

  /** As-of LEFT join: each left row paired with its `direction`-winning
    * right row of the same key (backward: greatest (rightTime, rightTie)
    * with rightTime ≤ leftTime; forward: least with rightTime ≥
    * leftTime; nearest: the time-closer of the two, backward on ties),
    * optionally bounded by `tolerance` in the time columns' raw units
    * (µs for timestamps, days for dates); unmatched left rows keep null
    * right columns. Column names must be unambiguous across the two
    * inputs; the key pair and the time pair must each share a physical
    * unit.
    *
    * `broadcastRight = true` switches to the map-side strategy
    * ([[BroadcastAsOfJoinExec]]): the right side broadcasts as a per-key
    * sorted time index and the probe side is never shuffled or sorted —
    * the right call when the right side is a bounded reference table and
    * the left is the 100 TB stream. Same results, spec-pinned. */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightTie: String,
           direction: String = "backward",
           tolerance: Option[Long] = None,
           broadcastRight: Boolean = false): DataFrame =
    joinMulti(left, right, Seq(leftKey -> rightKey), leftTime, rightTime,
      rightTie, direction, tolerance, broadcastRight)

  /** Multi-column-key as-of join (kdb `aj` takes any number of by
    * columns before the time: (symbol, exchange) quotes are the classic
    * case). `keys` pairs (leftCol, rightCol) in match-precedence order;
    * rows match when EVERY pair is equal (SQL equality: a null key on
    * either side never matches). Semantics otherwise identical to the
    * single-key [[join]]. */
  def joinMulti(left: DataFrame, right: DataFrame,
                keys: Seq[(String, String)],
                leftTime: String, rightTime: String,
                rightTie: String,
                direction: String = "backward",
                tolerance: Option[Long] = None,
                broadcastRight: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key pair")
    require(okDirections.contains(direction),
      s"as-of join direction must be one of ${okDirections.mkString("/")}, " +
        s"got '$direction'")
    tolerance.foreach(t => require(t >= 0,
      s"as-of join tolerance must be non-negative, got $t"))
    val lPlan = org.apache.spark.sql.graft.Shim.analyzed(left)
    val rPlan = org.apache.spark.sql.graft.Shim.analyzed(right)
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"as-of join: no column '$n' on the $side side " +
          s"(have: ${p.output.map(_.name).mkString(", ")})"))
    val lKeys = keys.map(k => attr(lPlan, k._1, "left"))
    val rKeys = keys.map(k => attr(rPlan, k._2, "right"))
    val lTime = attr(lPlan, leftTime, "left")
    val rTime = attr(rPlan, rightTime, "right")
    val rTie = attr(rPlan, rightTie, "right")
    (lKeys ++ rKeys).foreach { a =>
      require(okKeyTypes.contains(a.dataType),
        s"as-of join key '${a.name}' must be " +
          s"integral/timestamp/date/string, got ${a.dataType.simpleString}")
    }
    Seq(lTime, rTime, rTie).foreach { a =>
      require(okTimeTypes.contains(a.dataType),
        s"as-of join column '${a.name}' must be integral/timestamp/date, " +
          s"got ${a.dataType.simpleString}")
    }
    def sameUnit(l: Attribute, r: Attribute, what: String): Unit =
      require(unitFamily(l.dataType) == unitFamily(r.dataType),
        s"as-of join $what columns compare raw physical values and must " +
          s"share a unit: '${l.name}' is ${unitFamily(l.dataType)} but " +
          s"'${r.name}' is ${unitFamily(r.dataType)}")
    lKeys.zip(rKeys).foreach { case (l, r) => sameUnit(l, r, "key") }
    sameUnit(lTime, rTime, "time")
    org.apache.spark.sql.graft.Shim.ofRows(left.sparkSession,
      AsOfJoin(lPlan, rPlan, lKeys, rKeys, lTime, rTime, rTie,
        direction, tolerance, broadcastRight))
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** AS-OF JOIN as a WHOLE-OPERATOR Catalyst extension — the custom
  * LogicalPlan + Strategy + SparkPlan triple (registered through
  * `SparkSessionExtensions.injectPlannerStrategy`,
  * graft.GraftExtensions): for each left row, attach the right row of
  * the same key whose time is the LATEST at-or-before the left row's
  * time (null-extended when none) — the dedicated operator every
  * time-series engine ships (pandas `merge_asof`, Flink temporal join,
  * QuestDB/kdb ASOF JOIN) and Spark composes out of union + running
  * window (q10) or join + group-max (the oracle).
  *
  * Why a physical operator: the compositional forms pay either a
  * whole-corpus window sort with running state over BOTH streams
  * unioned, or a pairwise join that explodes on hot keys before its
  * group-max. [[AsofJoinExec]] instead declares
  * `ClusteredDistribution(keys)` + per-key time ordering and lets
  * EnsureRequirements plan ONE co-partitioning shuffle + sort per side,
  * then streams both sorted partitions through a two-pointer merge —
  * O(n+m) per partition, O(1) state (the single latest match), no
  * window buffer, no pair blowup. At 100 TB that is the difference
  * between a merge at shuffle bandwidth and a window holding the
  * unioned stream.
  *
  * Semantics notes: ties on right time keep the LAST row in (key, time)
  * sort order — deterministic whenever (rightTime) is unique per key
  * (the q182 oracle projects only the time value, so ties are
  * value-identical there); NULL keys and NULL times never match, on
  * either side — the SQL `c.key = p.key AND c.ts <= p.ts` contract the
  * oracle encodes (AsofJoinSpec pins it). The node is constructed
  * already-RESOLVED
  * (attributes come from analyzed children), so the analyzer passes it
  * through; the optimizer treats it as an opaque binary node (no
  * pushdown through it — project/filter BEFORE calling [[AsofJoin.asof]]).
  */
case class AsofJoin(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

object AsofJoin {
  /** Public entry: as-of join `left` to `right` on equal key pairs
    * (left-name → right-name; rename the right side when both carry the
    * same column names, the output is left ++ right verbatim), matching
    * the latest `rightTimeCol` ≤ `leftTimeCol` per left row. Output =
    * left columns ++ right columns (right side null-extended). */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[(String, String)],
      leftTimeCol: String, rightTimeCol: String): DataFrame = {
    val spark = left.sparkSession
    val lp = ColumnBridge.analyzedPlan(left)
    val rp = ColumnBridge.analyzedPlan(right)
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asof: column '$name' not in ${plan.output.map(_.name)}"))
    AsofJoinStrategy.ensureRegistered(spark)
    ColumnBridge.ofRows(spark, AsofJoin(lp, rp,
      keys.map(k => resolve(lp, k._1)), keys.map(k => resolve(rp, k._2)),
      resolve(lp, leftTimeCol), resolve(rp, rightTimeCol)))
  }
}

/** Plans the logical [[AsofJoin]] into [[AsofJoinExec]]. Injected by
  * graft.GraftExtensions; [[AsofJoinStrategy.ensureRegistered]] also
  * self-registers on sessions built without the extension (the
  * experimental-methods hook), so `AsofJoin.asof` works everywhere. */
object AsofJoinStrategy
    extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }

  private[plans] def ensureRegistered(spark: SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(this))
      spark.experimental.extraStrategies = strategies :+ this
  }
}

/** The physical as-of merge join. Requires both children clustered on
  * their keys and sorted by (keys, time) — EnsureRequirements inserts
  * the single co-partitioning exchange + sort per side — then merges
  * each co-partition with two pointers and O(1) carried state. */
case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // streamed (left) side's partitioning survives the merge
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val nRight = rOut.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lkProj = UnsafeProjection.create(lKeys, lOut)
      val rkProj = UnsafeProjection.create(rKeys, rOut)
      val ltProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rtProj = UnsafeProjection.create(Seq(rTime), rOut)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      val timeOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(Seq(timeType))
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      // SparkPlan's row contract: downstream consumers that bypass a
      // Project (getByteArrayRdd for collect/take, UnsafeRowSerializer
      // under a direct shuffle) cast to UnsafeRow — emit UnsafeRow like
      // SortMergeJoinExec does, via one reused projection per partition.
      // Bind against the null-extended right schema: BindReferences takes
      // nullability from the INPUT attributes, and unmatched left rows are
      // projected over the all-null nullRight slot — a non-nullable right
      // column would skip the null check and read 0/false instead of NULL
      // (SortMergeJoinExec binds buffered output withNullability(true)).
      val outProj =
        UnsafeProjection.create(outAttrs, lOut ++ rOut.map(_.withNullability(true)))

      new Iterator[InternalRow] {
        private val rBuf = rIter.buffered
        // carried state: the latest right match and the key it is for
        private var matchKey: InternalRow = _
        private var matchRow: InternalRow = _
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          // lkProj/ltProj reuse their result buffers across calls — both
          // values are consumed within THIS call only (matchKey stores a
          // copy), so skipping the per-left-row .copy() removes two
          // allocations per probe row from the merge's hot loop
          val lk = lkProj(l)
          val lt = ltProj(l)
          // SQL semantics (the q182 oracle's `c.key = p.key AND
          // c.ts <= p.ts`): a NULL key or time on either side never
          // matches — natural ascending ordering would otherwise treat
          // NULL == NULL and NULL ≤ anything (review finding). A
          // null-keyed/timed left row takes no match and does NOT
          // advance the cursor (null keys sort first, so later left
          // rows discard any skipped right rows themselves).
          if (lk.anyNull || lt.isNullAt(0)) return outProj(joined(l, nullRight))
          // advance the right cursor: discard keys before lk and
          // never-matching null rows; for key == lk buffer rows with
          // time <= lt (they arrive time-ASC, so the last buffered is
          // the latest); stop at time > lt or a later key. Left rows
          // come (key, time)-ASC, so the cursor never rewinds.
          var done = false
          while (!done && rBuf.hasNext) {
            val rk = rkProj(rBuf.head)
            if (rk.anyNull) { rBuf.next() }
            else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) { rBuf.next() }
              else if (c > 0) { done = true }
              else {
                val rt = rtProj(rBuf.head)
                if (rt.isNullAt(0)) { rBuf.next() }
                else if (timeOrd.compare(rt, lt) <= 0) {
                  matchRow = rBuf.next().copy()
                  // outlives this call, so store a copy — but only once
                  // per distinct key (matches of one key all compare 0)
                  if (matchKey == null || keyOrd.compare(matchKey, lk) != 0)
                    matchKey = lk.copy()
                } else done = true
              }
            }
          }
          val m =
            if (matchRow != null && matchKey != null &&
              keyOrd.compare(matchKey, lk) == 0) matchRow
            else nullRight
          outProj(joined(l, m))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, CoalescedHashPartitioning, Distribution, HashPartitioning, Partitioning, PartitioningCollection}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The custom-operator ladder's last rung (SURVEY.md §2: custom
  * `LogicalPlan` + `Strategy` + physical `SparkPlan`): a SORTED-MERGE
  * AS-OF JOIN as a first-class physical operator.
  *
  * The suite's other as-of form (q29) composes existing operators — a
  * tagged union + keyed running window. That pays one union materialize
  * and one window pass over BOTH streams. This operator expresses the
  * textbook merge directly: both sides hash-cluster on the key and sort
  * by (key, ts) — declared via [[AsOfJoinExec.requiredChildDistribution]]
  * / `requiredChildOrdering`, so EnsureRequirements plans the exchanges
  * and sorts (never hand-scheduled) — and each co-partition pair merges
  * in one linear pass: for every left row, the last right row of the
  * same key with `rts <= lts` (LEFT semantics: no match ⇒ right columns
  * NULL).
  *
  * Contract (enforced at facade level, `graftshim.AsOfBridge`):
  * key/ts columns are LongType; right (key, ts) pairs should be unique
  * when deterministic output matters (among full duplicates the merge
  * keeps the last in partition order, exactly like vendor ASOF joins).
  * Left rows stream, right rows buffer at most ONE live match per key —
  * O(1) state, the property that makes the operator safe at any scale.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)),
      ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lkOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltOrd = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rkOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtOrd = right.output.indexWhere(_.exprId == rightTs.exprId)
    require(lkOrd >= 0 && ltOrd >= 0 && rkOrd >= 0 && rtOrd >= 0,
      "as-of join: key/ts attributes not found in child output")
    val outTypes = output.map(_.dataType).toArray
    val nRight = right.output.length
    val lRdd = left.execute()
    val rRdd = right.execute()
    // zipPartitions would throw its own (opaque) error — surface the
    // co-partitioning contract explicitly if a planner change (e.g. an
    // asymmetric AQE coalesce) ever desynchronizes the two sides
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"as-of join children lost co-partitioning: ${lRdd.getNumPartitions}" +
        s" vs ${rRdd.getNumPartitions} partitions")
    // A partition-COUNT match is necessary but not sufficient: AQE could
    // in principle coalesce both exchanges to the same count with
    // DIFFERENT bucket boundaries, which would zip mis-aligned key
    // ranges and silently drop matches to NULL. Assert the shape: both
    // children hash-partitioned on exactly their join key, and if
    // coalesced, with identical boundary specs.
    def hashShapeOpt(p: Partitioning, key: Attribute): Option[(Int, Seq[Any])] =
      p match {
        case HashPartitioning(exprs, n)
            if exprs.length == 1 && exprs.head.semanticEquals(key) =>
          Some((n, Nil))
        case CoalescedHashPartitioning(HashPartitioning(exprs, _), specs)
            if exprs.length == 1 && exprs.head.semanticEquals(key) =>
          Some((specs.length, specs))
        // a PartitioningCollection satisfies ClusteredDistribution when ANY
        // member does (e.g. the output of an upstream join carrying both
        // sides' partitionings) — accept the first matching member instead
        // of fail-louding on a valid plan
        case PartitioningCollection(ps) =>
          ps.iterator.flatMap(hashShapeOpt(_, key)).nextOption()
        case _ => None
      }
    def hashShape(p: Partitioning, key: Attribute, side: String)
        : (Int, Seq[Any]) =
      hashShapeOpt(p, key).getOrElse(throw new IllegalStateException(
        s"as-of join: $side child is not hash-partitioned on its key " +
          s"(${key.name}) — got $p"))
    if (lRdd.getNumPartitions > 1) { // 1 partition is trivially aligned
      val (ln, lSpecs) = hashShape(left.outputPartitioning, leftKey, "left")
      val (rn, rSpecs) = hashShape(right.outputPartitioning, rightKey, "right")
      require(ln == rn && lSpecs == rSpecs,
        s"as-of join children coalesced to mismatched bucket boundaries: " +
          s"left=($ln, $lSpecs) right=($rn, $rSpecs)")
    }
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outTypes)
      // O(1) merge state: the latest qualifying right row (copied — the
      // underlying UnsafeRow is reused by the iterator) and its key
      var m: InternalRow = null
      var mKey = 0L
      lIter.map { lrow =>
        val lk = lrow.getLong(lkOrd)
        val lt = lrow.getLong(ltOrd)
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val h = rBuf.head
          val rk = h.getLong(rkOrd)
          if (rk < lk || (rk == lk && h.getLong(rtOrd) <= lt)) {
            // rows with rk < lk can never match again (left keys are
            // non-decreasing) — discard; same-key rows become the
            // latest candidate
            if (rk == lk) { m = h.copy(); mKey = lk }
            rBuf.next()
          } else advancing = false
        }
        val rr = if (m != null && mKey == lk) m else nullRight
        proj(joined(lrow, rr))
      }
    }
  }
}

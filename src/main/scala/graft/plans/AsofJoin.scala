package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native as-of (temporal lookup) join — the whole-operator extension
  * rung of the brief's ladder (custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`), used where composing built-ins genuinely costs more:
  * the union+last_value formulation in [[graft.ops.AsofQueries]] windows
  * over the UNION of both sides (shuffle + sort of probe AND build rows
  * together, then a filter discards the build rows), while this operator
  * shuffles each side on its own key, sorts within partitions, and
  * streams a single forward merge — O(n+m) per partition, no union
  * blow-up, and the probe side's columns never ride through a window.
  *
  * Semantics (matches DuckDB `ASOF LEFT JOIN` with `l.time >= r.time`):
  * every left row is emitted once, extended with the right row of the
  * same key having the LARGEST right-time <= left-time, or nulls if no
  * such row. Null keys/times never match (SQL equality semantics).
  *
  * Scale posture: the two `ClusteredDistribution` requirements let
  * EnsureRequirements co-partition both sides on the key (exactly the
  * SMJ contract), so at 100 TB this is one shuffle per side + an
  * in-partition sort — identical cost shape to a sort-merge join, with
  * the merge itself linear and early-terminating per key group.
  */
case class AsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

object AsofJoin {

  /** Build an as-of-joined DataFrame. Keys/times are resolved BY NAME
    * against each side to keep the API unambiguous when both sides
    * carry the same column names (the common case). The right side is
    * re-aliased with fresh expression ids so self-join lineage (left
    * and right derived from the same scan) never produces conflicting
    * attributes — the same dedup the analyzer does for built-in joins. */
  def apply(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val spark = SparkSession.active
    AsofJoinStrategy.install(spark)
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan0 = rightDf.queryExecution.analyzed
    val rAliases = rPlan0.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rPlan0)
    def resolve(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"as-of column $name not in ${out.map(_.name).mkString(",")}"))
    val rOut = rAliases.map(_.toAttribute)
    val (lk, rk) = (resolve(lPlan.output, leftKey), resolve(rOut, rightKey))
    val (lt, rt) = (resolve(lPlan.output, leftTime), resolve(rOut, rightTime))
    // the exec builds its comparators from the LEFT types and applies
    // them to right-side values — a mismatch must fail HERE, not as an
    // executor-side ClassCastException mid-merge
    def sameType(a: Attribute, b: Attribute, what: String): Unit =
      require(org.apache.spark.sql.types.DataType.equalsStructurally(
          a.dataType, b.dataType, ignoreNullability = true),
        s"as-of $what types differ: ${a.name}: ${a.dataType} vs ${b.name}: ${b.dataType}")
    sameType(lk, rk, "key")
    sameType(lt, rt, "time")
    org.apache.spark.sql.graft.PlanBridge.ofRows(spark,
      AsofJoin(lPlan, rPlan, lk, rk, lt, rt))
  }
}

/** Planner strategy for [[AsofJoin]] — registered per-session via
  * [[AsofJoinStrategy.install]] or cluster-wide through
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }

  /** Install on a running session (extensions only apply at build). */
  def install(spark: SparkSession): Unit = {
    val em = spark.sessionState.experimentalMethods
    if (!em.extraStrategies.contains(this))
      em.extraStrategies = em.extraStrategies :+ this
  }
}

/** Physical as-of join: co-partitioned + in-partition-sorted children,
  * then a linear forward merge per partition. */
case class AsofJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  /** Total-order comparator for the supported key/time types. Planning
    * fails loudly for exotic types rather than comparing wrongly. */
  private def comparator(dt: DataType): (Any, Any) => Int = dt match {
    case IntegerType | DateType =>
      (a, b) => java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case LongType | TimestampType | TimestampNTZType =>
      (a, b) => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case ShortType =>
      (a, b) => java.lang.Short.compare(a.asInstanceOf[Short], b.asInstanceOf[Short])
    case DoubleType =>
      (a, b) => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case FloatType =>
      (a, b) => java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
    case _: StringType =>
      (a, b) => a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    case other => throw new UnsupportedOperationException(
      s"as-of join key/time type $other not supported")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val out = output
    val lKeyB = BindReferences.bindReference(leftKey, leftOut)
    val lTimeB = BindReferences.bindReference(leftTime, leftOut)
    val rKeyB = BindReferences.bindReference(rightKey, rightOut)
    val rTimeB = BindReferences.bindReference(rightTime, rightOut)
    val cmpKey = comparator(leftKey.dataType)
    val cmpTime = comparator(leftTime.dataType)
    val rightWidth = rightOut.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      // bind against null-FORCED right attributes: the null-extended rows
      // must go through a null check even when the child declared the
      // column non-nullable
      val project = UnsafeProjection.create(out,
        leftOut ++ rightOut.map(_.withNullability(true)))
      new Iterator[InternalRow] {
        // rHead: next right row not yet merged; its key/time are only
        // read while it stays current (rIter.next() invalidates it, and
        // we never call next() while rHead is live)
        private var rHead: InternalRow = _
        private var rHeadKey: Any = _
        private var rHeadTime: Any = _
        // candidate: last right row of candKey with time <= the current
        // left time; COPIED because it outlives the iterator's row reuse
        private var candRow: InternalRow = _
        private var candKey: Any = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val k = lKeyB.eval(l)
          val t = lTimeB.eval(l)
          if (k == null || t == null) return project(joined(l, nullRight))
          var stop = false
          while (!stop) {
            if (rHead == null) {
              if (rIter.hasNext) {
                val r = rIter.next()
                val rk = rKeyB.eval(r)
                val rt = rTimeB.eval(r)
                if (rk != null && rt != null) {
                  rHead = r; rHeadKey = rk; rHeadTime = rt
                } // else: null key/time never matches — drop the row
              } else stop = true
            } else {
              val c = cmpKey(rHeadKey, k)
              if (c < 0) rHead = null // right key already passed: discard
              else if (c > 0) stop = true // right side ahead: hold
              else if (cmpTime(rHeadTime, t) <= 0) {
                candRow = rHead.copy() // may serve several left rows
                candKey = rKeyB.eval(candRow)
                rHead = null
              } else stop = true // same key but future time: hold
            }
          }
          if (candRow != null && cmpKey(candKey, k) == 0) project(joined(l, candRow))
          else project(joined(l, nullRight))
        }
      }
    }
  }
}

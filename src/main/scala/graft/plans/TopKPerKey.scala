package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftshim.DatasetShim

/** Per-key top-k as a first-class operator — SURVEY §7.4's tier (c):
  * logical node + planner strategy + physical exec.
  *
  * Motivation: the idiomatic formulation
  * `row_number().over(Window.partitionBy(keys).orderBy(ord)) <= k`
  * fully sorts every key group; this operator keeps a size-k bounded heap
  * per key instead — O(n log k) per partition, no sort, memory bounded by
  * (distinct keys per partition) × k rows, the same contract as
  * hash aggregation. The shuffle on the keys is declared via
  * `requiredChildDistribution`, so Catalyst inserts (or elides, if the
  * child is already clustered) the exchange exactly like any aggregate.
  *
  * Ordering ties are broken arbitrarily — pass a struct ordering column
  * with a unique tiebreaker for deterministic results.
  */
case class TopKPerKeyNode(
    child: LogicalPlan,
    keys: Seq[Expression],
    order: Expression,
    k: Int,
    largest: Boolean)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

/** `partial = true` is the map-side combine: it runs BEFORE the exchange
  * (no distribution requirement) so at most k rows per key per input
  * partition are shuffled — the aggregation-style two-phase plan
  *
  * {{{ Final(Exchange(Partial(child))) }}}
  *
  * that a 100 TB top-k needs; shuffle volume is bounded by
  * k · |keys| · numMapPartitions instead of the full input.
  */
case class TopKPerKeyExec(
    child: SparkPlan,
    keys: Seq[Expression],
    order: Expression,
    k: Int,
    largest: Boolean,
    partial: Boolean = false)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    (if (partial) org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution
     else ClusteredDistribution(keys)) :: Nil
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"

  // Plan/UI observability, matching the built-in operators' conventions.
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numGroups" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of key groups"),
    "numEvictions" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "heap evictions"))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val ordExpr = order
    val childOutput = child.output
    val kk = k
    val big = largest
    val mOut = longMetric("numOutputRows")
    val mGroups = longMetric("numGroups")
    val mEvict = longMetric("numEvictions")
    child.execute().mapPartitionsWithIndex({ (pidx, iter) =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordEval = ordExpr // bound below via projection-free eval
      val boundOrd = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(ordEval, childOutput)
      // nondeterministic order expressions (rand() etc.) must be seeded
      // per partition before eval — WindowExec does the same
      boundOrd.foreach {
        case n: org.apache.spark.sql.catalyst.expressions.Nondeterministic =>
          n.initialize(pidx)
        case _ =>
      }
      // PhysicalDataType.ordering is a primitive ordering for atomic types
      // and would NPE unboxing a null order value; wrap it so null compares
      // SMALLEST — exactly the default SQL null ordering the RankLimitRule
      // guard admits (ASC/NULLS FIRST ranks nulls first = kept by the
      // smallest-k heap; DESC/NULLS LAST ranks them last = never preferred
      // by the largest-k heap).
      val base = PhysicalDataType.ordering(ordExpr.dataType)
        .asInstanceOf[Ordering[Any]]
      val valueOrdering: Ordering[Any] = new Ordering[Any] {
        override def compare(a: Any, b: Any): Int =
          if (a == null && b == null) 0
          else if (a == null) -1
          else if (b == null) 1
          else base.compare(a, b)
      }
      // a STORED ordering value must not alias the scan's reused row
      // buffer: a UTF8String (or struct field) read off an UnsafeRow is a
      // VIEW into that buffer, and by the time the heap compares it the
      // buffer holds a later row — every stored string key then collapses
      // to the same bytes and the ordering silently degenerates to the
      // numeric tiebreaker (observed: a row_number<=k rewrite over an md5
      // ordering column returned lowest-doc_id-per-key instead; numeric
      // orderings were unaffected, which is why the original specs
      // passed). Numeric values are boxed copies already; strings, arrays
      // and struct FIELDS need a deep copy AT ENQUEUE TIME — comparing a
      // fresh value is safe, the buffer is live during eval. UnsafeRow
      // copies are byte-deep; GenericInternalRow.copy() is SHALLOW, so
      // generic structs recurse field-by-field against the declared type.
      def copyOrdValue(v: Any, dt: org.apache.spark.sql.types.DataType): Any =
        v match {
          case null => null
          case u: UnsafeRow => u.copy()
          case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
          case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
          case r: InternalRow =>
            val st = dt.asInstanceOf[org.apache.spark.sql.types.StructType]
            val arr = new Array[Any](st.size)
            var i = 0
            while (i < st.size) {
              arr(i) =
                if (r.isNullAt(i)) null
                else copyOrdValue(r.get(i, st(i).dataType), st(i).dataType)
              i += 1
            }
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(arr)
          case x => x
        }
      // keep the k LARGEST under `ord` (or smallest if !largest): the heap
      // root is the current worst element, evicted on overflow
      val heapOrd: Ordering[(Any, UnsafeRow)] =
        if (big) Ordering.by[(Any, UnsafeRow), Any](_._1)(valueOrdering).reverse
        else Ordering.by[(Any, UnsafeRow), Any](_._1)(valueOrdering)
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[(Any, UnsafeRow)]]()
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[(Any, UnsafeRow)](heapOrd)
          heaps.put(key.copy(), heap)
          mGroups += 1
        }
        val v = boundOrd.eval(row)
        if (heap.size < kk)
          heap.enqueue((copyOrdValue(v, ordExpr.dataType), rowProj(row).copy()))
        else {
          val worst = heap.head._1
          val better = if (big) valueOrdering.compare(v, worst) > 0
            else valueOrdering.compare(v, worst) < 0
          if (better) {
            heap.dequeue()
            heap.enqueue((copyOrdValue(v, ordExpr.dataType), rowProj(row).copy()))
            mEvict += 1
          }
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { h => mOut += h.size; h.iterator.map(_._2) }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(child, keys, order, k, largest) =>
      TopKPerKeyExec(
        TopKPerKeyExec(planLater(child), keys, order, k, largest, partial = true),
        keys, order, k, largest) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** Column-API entry: top `k` rows per key group under `order`. Registers
    * the planner strategy on the session if missing (idempotent), so it
    * works on any session, not only `GraftSession`-built ones.
    */
  def topKPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      order: Column,
      k: Int,
      largest: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    val analyzed = df.queryExecution.analyzed
    // session resolver, not string equality: column names resolve
    // case-insensitively under the default spark.sql.caseSensitive=false,
    // same as every built-in API
    val resolver = spark.sessionState.conf.resolver
    val keyExprs: Seq[Expression] =
      keyCols.map(n => analyzed.output.find(a => resolver(a.name, n)).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${analyzed.output}")))
    // Resolve the ordering Column against this exact child (a Column from
    // the public API wraps unresolved ColumnNodes, which the analyzer only
    // resolves through Dataset operations — so run it through a select and
    // take the resolved expression; expression IDs line up because the
    // child plan is shared).
    val resolvedOrder: Expression =
      df.select(order.as("__graft_ord")).queryExecution.analyzed
        .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Project]
        .projectList.head match {
        case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
        case e => e
      }
    DatasetShim.ofRows(spark,
      TopKPerKeyNode(analyzed, keyExprs, resolvedOrder, k, largest))
  }
}

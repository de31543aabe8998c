package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Top-k rows per key — the whole-operator custom-plan showcase (SURVEY §2
  * preference ladder (c): LogicalPlan + Strategy + SparkPlan, registered
  * through `SparkSessionExtensions`).
  *
  * The composable formulation (`row_number().over(Window.partitionBy(key)
  * .orderBy(ord)) <= k`) must SORT every key group in full; this operator
  * keeps a bounded k-buffer per key instead — O(n log k) with no global
  * per-key sort buffer, which is the difference between "works" and "spills"
  * when one key holds a billion rows at 100 TB.
  *
  * Output equals the window formulation row-for-row (same total order,
  * deterministic when `order` is total), so the DuckDB window oracle doubles
  * as this operator's oracle.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** The bounded per-key heap pass over one partition's rows — shared by
    * the partial (pre-shuffle) and final (post-shuffle) execs, exactly the
    * way partial/final HashAggregate share their update loop.
    */
  def boundedTopK(rows: Iterator[InternalRow], keyExprs: Seq[Expression],
      sortOrder: Seq[SortOrder], schema: Seq[Attribute],
      k: Int): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(keyExprs, schema)
    val ordering = new LazilyGeneratedOrdering(sortOrder, schema)
    // per key: a bounded buffer of the k smallest rows under `ordering`
    val buffers = new java.util.HashMap[InternalRow,
      java.util.PriorityQueue[InternalRow]]()
    // PQ is a max-heap under `ordering` so the head is the current worst
    val reverse = ordering.reverse
    rows.foreach { row =>
      val key = keyProj(row).copy()
      var pq = buffers.get(key)
      if (pq == null) {
        pq = new java.util.PriorityQueue[InternalRow](k + 1, reverse)
        buffers.put(key, pq)
      }
      if (pq.size < k) pq.add(row.copy())
      else if (ordering.compare(row, pq.peek()) < 0) {
        pq.poll(); pq.add(row.copy())
      }
    }
    val out = Seq.newBuilder[InternalRow]
    buffers.values.forEach { pq =>
      val arr = new Array[InternalRow](pq.size)
      var i = arr.length - 1
      while (!pq.isEmpty) { arr(i) = pq.poll(); i -= 1 }
      arr.foreach(out += _)
    }
    out.result().iterator
  }
}

/** Map-side partial top-k: prunes each input partition to ≤ k rows per key
  * BEFORE the exchange, so the shuffle moves min(n, k × partitions) rows
  * per key instead of every row — for one hot key holding a billion rows
  * at 100 TB, that is the difference between shuffling the key's whole
  * corpus to one reducer and shuffling k rows per map task. Rows dropped
  * here lose to ≥ k same-key rows in their own partition, so they can
  * never reach the global top-k; with a total `order` (the operator's
  * determinism contract) partial∘final ≡ final.
  */
case class TopKPerKeyPartialExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  // runs on whatever partitioning the child has (and preserves it, so an
  // already-clustered child still skips the exchange above)
  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (keyExprs, sortOrder, schema, kk) = (keys, order, child.output, k)
    child.execute().mapPartitions(
      TopKPerKeyExec.boundedTopK(_, keyExprs, sortOrder, schema, kk))
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  /** Shuffle all surviving rows of a key to one partition; the
    * per-partition buffer then sees every candidate for its keys.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val (keyExprs, sortOrder, schema, kk) = (keys, order, child.output, k)
    child.execute().mapPartitions(
      TopKPerKeyExec.boundedTopK(_, keyExprs, sortOrder, schema, kk))
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      // partial (map-side prune) under final (post-shuffle top-k) — the
      // exchange the final's distribution requirement inserts lands
      // between them
      TopKPerKeyExec(keys, order, k,
        TopKPerKeyPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** `SparkSession.builder().withExtensions(new GraftExtensions)` — or config
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    e.injectPlannerStrategy(_ => TopKStrategy)
}

object TopKPerKey {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
  import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Top-k per key as a DataFrame transform. `order` entries are
    * (columnName, "asc" | "desc"). Attributes are built unresolved and the
    * analyzer binds them against the child — Spark-4 `Column`s carry lazy
    * ColumnNode wrappers that custom nodes must not embed directly.
    */
  def topK(df: DataFrame, keys: Seq[String], order: Seq[(String, String)],
      k: Int): DataFrame = {
    // idempotently register the planner strategy on this session
    val strategies = df.sparkSession.experimental.extraStrategies
    if (!strategies.contains(TopKStrategy))
      df.sparkSession.experimental.extraStrategies = strategies :+ TopKStrategy
    val keyExprs = keys.map(n => UnresolvedAttribute.quoted(n): Expression)
    val orderExprs = order.map { case (n, dir) =>
      SortOrder(UnresolvedAttribute.quoted(n),
        if (dir.equalsIgnoreCase("desc")) Descending else Ascending)
    }
    val plan = TopKPerKey(keyExprs, orderExprs, k,
      df.queryExecution.analyzed)
    ColumnBridge.ofRows(df.sparkSession, plan)
  }
}

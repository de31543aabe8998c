package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}

/** Study main (r18 verdict task 1): WHY doesn't ReuseExchange fold the two
  * identical window-build exchanges in SpanDedup's raw path?
  *
  * The raw span/novelty plan repartitions the exploded window frame on its
  * hash key and feeds TWO consumers — the hash aggregate (shared/duplicated
  * window detection) and the join back. Both consumers' plans contain the
  * byte-identical `repartition(h)` exchange subtree, yet the r17 1000×
  * event logs show the window-build map stage executing TWICE (~5.2 GB
  * shuffle written by each). This probe answers, on a small corpus where
  * the whole plan is inspectable:
  *
  *   arm A ("span-shape"): explode(transform(sequence…)) window build →
  *         repartition(h) → {groupBy(h).count_distinct + join back} —
  *         the exact SpanDedup.rawSpanStats shape;
  *   arm B ("plain-shape"): the same dual-consumer DAG with NO
  *         higher-order functions (a scalar project instead of the
  *         explode/transform) — the control that isolates whether lambda
  *         canonicalization is the culprit;
  *   arm C: arm A with AQE off — isolates whether the failure is the
  *         AQE stage-cache path vs the rule-based ReuseExchange path.
  *
  * For each arm it executes the plan, then reports (1) how many physical
  * Exchange nodes exist, (2) how many were replaced by ReusedExchange /
  * reused shuffle query stages, and (3) whether the two exchange subtrees
  * canonicalize equal (`e1.canonicalized == e2.canonicalized`) — the exact
  * predicate both reuse mechanisms key on.
  */
object ReuseProbe {

  /** All nodes of an executed (possibly adaptive) plan, descending into
    * materialized adaptive sub-plans.
    */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(allNodes)
  }

  private def report(name: String, df: DataFrame): Unit = {
    // drive the SAME QueryExecution we inspect: a noop .write plans a
    // fresh QueryExecution, leaving df.queryExecution's adaptive plan
    // un-materialized (the first probe draft read the INITIAL plan and
    // saw zero query stages)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val nodes = allNodes(plan)
    val exchanges = nodes.collect { case e: Exchange => e }
    val reusedEx = nodes.collect { case r: ReusedExchangeExec => r }
    // AQE reuse = a ShuffleQueryStageExec whose wrapped plan is a
    // ReusedExchangeExec (the stage cache hit); count both wrappers and
    // the distinct underlying stage ids actually materialized
    val stageNodes = nodes.filter(_.getClass.getSimpleName
      .contains("QueryStageExec"))
    val canonPairs = exchanges.combinations(2).count {
      case Seq(a, b) => a.canonicalized == b.canonicalized
      case _ => false
    }
    println(s"[$name] exchanges=${exchanges.length} " +
      s"reusedExchangeNodes=${reusedEx.length} " +
      s"queryStages=${stageNodes.length} " +
      s"canonicallyEqualPairs=$canonPairs")
    exchanges.zipWithIndex.foreach { case (e, i) =>
      println(s"[$name] exchange#$i canonical hash=" +
        e.canonicalized.semanticHash())
      if (sys.env.get("SPARK_GRAFT_PROBE_VERBOSE").exists(_ == "1"))
        println(s"[$name] exchange#$i canonicalized:\n" +
          e.canonicalized.toString.linesIterator.map("      " + _)
            .mkString("\n"))
    }
    stageNodes.collect { case q: QueryStageExec => q }.zipWithIndex
      .foreach { case (q, i) =>
        println(s"[$name] stage#$i id=${q.id} " +
          s"${q.getClass.getSimpleName} -> ${q.plan.getClass.getSimpleName}")
      }
    println(s"[$name] finalPlan:\n" + plan.toString.linesIterator
      .map("    " + _).mkString("\n"))
  }

  private def spanShape(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("nw", size(col("w")).cast("long"))
    val wins = base.where(col("nw") >= 8)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), (col("nw") - 8).cast("int")),
          i => array_join(slice(col("w"), i + 1, lit(8)), " "))).as("ws"))
      .select(col("doc_id"),
        struct(xxhash64(col("ws")).as("h1"),
          xxhash64(lit(1L), col("ws")).as("h2")).as("h"))
      .repartition(col("h"))
    val shared = wins.groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .where(col("nd") >= 2).select(col("h"))
    wins.join(shared, "h").groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup"))
  }

  /** The pre-r18 REAL rawSpanStats shape: spanShape's dual-consumer DAG
    * PLUS the outer n_windows left join back to the per-doc stats — the
    * suspect for the reuse failure. A LeftOuter join infers
    * isnotnull(right key) on the right side only; that filter pushes
    * through the dup aggregate into the JOIN consumer's copy of the
    * window build but not the count_distinct consumer's copy (doc_id
    * there is an agg input, not a key the join constrains), so the two
    * exchange subtrees stop canonicalizing equal.
    */
  private def spanOuterShape(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("nw", size(col("w")).cast("long"))
    val dup = spanShape(docs)
    base.select(col("doc_id"),
        greatest(col("nw") - 7, lit(0L)).as("n_windows"))
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
  }

  private def plainShape(docs: DataFrame): DataFrame = {
    val wins = docs.select(col("doc_id"),
        struct(xxhash64(col("text")).as("h1"),
          xxhash64(lit(1L), col("text")).as("h2")).as("h"))
      .repartition(col("h"))
    val shared = wins.groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .where(col("nd") >= 2).select(col("h"))
    wins.join(shared, "h").groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.builderFor(s"local[$cpus]", cpus, dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)
    val arms = sys.env.getOrElse("SPARK_GRAFT_PROBE_ARMS",
      "span,plain,spanNoBc,spanNoAqe,plainNoAqe")
      .split(",").map(_.trim).toSet
    // the REAL registered queries (run with SPARK_GRAFT_SPAN_NO_COLLAPSE=1
    // to force the raw path this probe studies)
    if (arms("real")) report("real-span_dedup",
      SparkEntry.queries("span_dedup")(spark, dir))
    if (arms("realNovelty")) report("real-novelty_ngrams",
      SparkEntry.queries("novelty_ngrams")(spark, dir))
    if (arms("span")) report("span-shape/AQE", spanShape(docs))
    if (arms("spanOuter"))
      report("span-outer-shape/AQE", spanOuterShape(docs))
    if (arms("spanOuterNoInfer")) {
      // the falsification arm: if the isnotnull inference asymmetry is
      // the root cause, turning constraint propagation OFF must restore
      // the fold in the very shape that broke it
      spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
      report("span-outer-shape/AQE/noConstraintPropagation",
        spanOuterShape(docs))
      spark.conf.set("spark.sql.constraintPropagation.enabled", "true")
    }
    if (arms("plain")) report("plain-shape/AQE", plainShape(docs))
    if (arms("spanNoBc")) {
      // the decade regime: shared-hash side too big to broadcast, so the
      // join consumer is a shuffle join — does stage reuse still fire?
      // (save/restore the ambient threshold rather than resetting to the
      // Spark default, so later arms run under the session's own value)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      report("span-shape/AQE/noBroadcast", spanShape(docs))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    if (arms("spanNoAqe")) report("span-shape/noAQE", spanShape(docs))
    if (arms("plainNoAqe")) report("plain-shape/noAQE", plainShape(docs))
    spark.stop()
  }
}

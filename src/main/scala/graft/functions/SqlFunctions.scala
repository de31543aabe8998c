package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the native Catalyst kernels: every fixed-shape graft
  * expression as a `graft_*` SQL function, so `spark.sql` users (and
  * JDBC/notebook sessions) reach the codegen kernels without Scala —
  * the engine's analogue of the reference being fully config-driven
  * (a user never writes Java against `embulk-executor-mapreduce`
  * either; `MapReduceExecutorTask.java:20-60` is its whole surface).
  *
  * Two registration paths, one builder table:
  *  - new sessions: `GraftExtensions` (spark.sql.extensions=
  *    graft.plans.GraftExtensions) injects them at session build;
  *  - existing sessions: [[register]] adds them to the live session's
  *    function registry (temp functions, session-scoped).
  *
  * Kernel parameters that shape codegen (shingle n, minhash k,
  * Levenshtein bound, LSH geometry) must be foldable literals — they
  * become constants inside the generated code, exactly like the Scala
  * API's `Int` parameters.
  */
object SqlFunctions {

  private def litInt(fn: String, arg: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def arity(fn: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.length}")

  /** (name, builder) for every SQL-exposed kernel. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> { args =>
      arity("graft_cosine", 2, args); CosineSim(args(0), args(1)) },
    "graft_sorted_jaccard" -> { args =>
      arity("graft_sorted_jaccard", 2, args)
      SortedJaccard(args(0), args(1)) },
    "graft_simhash64" -> { args =>
      arity("graft_simhash64", 1, args); SimHash64(args(0)) },
    "graft_nfc_clean" -> { args =>
      arity("graft_nfc_clean", 1, args); NfcClean(args(0)) },
    "graft_bpe_count" -> { args =>
      arity("graft_bpe_count", 1, args); BpeCount(args(0)) },
    "graft_quality_stats" -> { args =>
      arity("graft_quality_stats", 1, args); QualityStats(args(0)) },
    "graft_word_shingles" -> { args =>
      arity("graft_word_shingles", 2, args)
      WordShingles(args(0), litInt("graft_word_shingles", "n", args(1))) },
    "graft_minhash_slots" -> { args =>
      arity("graft_minhash_slots", 2, args)
      MinHashSlots(args(0), litInt("graft_minhash_slots", "k", args(1))) },
    "graft_bounded_levenshtein" -> { args =>
      arity("graft_bounded_levenshtein", 3, args)
      BoundedLevenshtein(args(0), args(1),
        litInt("graft_bounded_levenshtein", "maxDist", args(2))) },
    "graft_lsh_buckets" -> { args =>
      arity("graft_lsh_buckets", 4, args)
      LshBuckets(args(0), litInt("graft_lsh_buckets", "nPlanes", args(1)),
        litInt("graft_lsh_buckets", "tables", args(2)),
        litInt("graft_lsh_buckets", "dims", args(3))) })

  /** Injection tuples for `SparkSessionExtensions.injectFunction`. */
  def injectables: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] =
    builders.map { case (name, b) =>
      (FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.SqlFunctions", name), b)
    }

  /** Register all kernels as temp functions on a live session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      ColumnBridge.registerTempFunction(spark, name, b)
    }
}

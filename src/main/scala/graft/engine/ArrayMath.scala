package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over plain `array<double>` columns using
  * Spark's codegen'd higher-order functions (`zip_with`, `aggregate`,
  * `transform`) — no UDFs, so everything stays inside whole-stage
  * codegen and is expressible in the DuckDB oracle.
  *
  * The reference does this math on `mllib.linalg.Vector` with
  * `Vectors.sqdist` inside RDD closures (SURVEY.md §2.1 [REPO-RECON]);
  * here it is declarative so Catalyst can fuse it with the surrounding
  * plan.
  */
object ArrayMath {
  /** Σ (a_i − b_i)² — squared Euclidean distance (higher-order-function
    * form; identical IEEE operation order to [[sqDistNative]]). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Native fused form of [[sqDist]] (graft.engine.expr.SqDist with
    * doGenCode — no per-row array allocation). The `sq_dist` function
    * must be registered on the session (GraftFunctions.register);
    * callers inside the engine register defensively. */
  def sqDistNative(a: Column, b: Column): Column =
    call_function("sq_dist", a, b)

  /** Euclidean distance. */
  def dist(a: Column, b: Column): Column = sqrt(sqDist(a, b))

  /** Σ a_i · b_i — dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Native fused form of [[dot]] (graft.engine.expr.DotProd with
    * doGenCode — no per-row array allocation; identical IEEE operation
    * order). Requires GraftFunctions.register on the session. */
  def dotNative(a: Column, b: Column): Column =
    call_function("dot_prod", a, b)

  /** ‖a‖₂ — L2 norm. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity a·b / (‖a‖‖b‖). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cast an array<float> column to array<double> (all index math is
    * double; matches the oracle's CAST AS DOUBLE discipline, §7.6).
    * Array-level Cast — native codegen elementwise cast, where the
    * `transform(a, _.cast)` lambda form ran interpreted per element. */
  def toDouble(a: Column): Column = a.cast("array<double>")
}

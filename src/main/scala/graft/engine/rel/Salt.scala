package graft.engine.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe equi-join (the manual fallback when AQE's skew-join
  * splitting isn't available — e.g. the skewed side is the OUTPUT of
  * an aggregation AQE won't re-split, or a non-shuffle join input).
  *
  * Mechanics: the skewed (probe) side gets a deterministic per-row
  * salt in [0, S); the dimension (build) side is replicated S times,
  * once per salt value; the join key becomes (key, salt), so one hot
  * key's rows scatter across S shuffle partitions instead of one.
  * Replication cost is S × |build side| — pick S ≈ (hot-key rows /
  * target partition rows), keep the build side small.
  *
  * The salt is `pmod(xxhash64(salt columns), S)` — content-based and
  * deterministic, so re-runs and retries place every row in the same
  * salted partition (a `rand()` salt breaks task retry idempotency
  * and reproducibility). LIMITATION of content-based salting: rows
  * that are byte-identical across the salt columns hash to the SAME
  * salt, so a hot key made of exact duplicate rows does not scatter —
  * pass `saltOn` with a distinguishing column (a source row id /
  * file offset) when the skewed input can contain duplicates.
  */
object Salt {

  /** Deterministic salt column over the given columns. */
  def saltCol(salts: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(salts))

  /** Equi-join `skewed ⋈ dim` on `key`, scattering each key across
    * `salts` shuffle partitions. Semantics identical to
    * `skewed.join(dim, key)` (inner). `saltOn` picks the columns the
    * salt is derived from (default: all probe columns — see the
    * duplicate-row limitation above). */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String, salts: Int,
                 saltOn: Seq[Column] = Nil): DataFrame = {
    val sCols = if (saltOn.nonEmpty) saltOn else skewed.columns.toSeq.map(skewed(_))
    val left = skewed.withColumn("__salt", saltCol(salts, sCols: _*))
    val right = dim.crossJoin(
      dim.sparkSession.range(salts).select(col("id").cast("int").as("__salt")))
    left.join(right, Seq(key, "__salt")).drop("__salt")
  }
}

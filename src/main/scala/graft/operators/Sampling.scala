package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling — the training-mix cut ("sample k
  * docs proportional to quality weight") made reproducible at 100 TB.
  *
  * Efraimidis–Spirakis A-ES: each row draws u ∈ (0,1] and scores
  * key = u^(1/w); the k largest keys are distributed identically to
  * k sequential weighted draws WITHOUT replacement (Efraimidis &
  * Spirakis 2006, "Weighted random sampling with a reservoir"). The
  * uniform comes from a SALTED CONTENT HASH, never `rand()`: the cut is
  * a pure per-row expression — reproducible across runs, restartable
  * mid-job, and re-drawable by changing the salt.
  *
  * Scale shape: the key is map-side arithmetic; the global top-k plans
  * as TakeOrderedAndProject (per-partition partial top-k, k rows per
  * partition to the driver) — no corpus shuffle, no global sort. The
  * per-group variant is one keyed window shuffle.
  */
object Sampling {

  /** Salted uniform in (0,1] from the row's id — pure, engine-exact
    * integer arithmetic until the final division. The full 64-bit hash
    * maps over 2^63 granules (unsigned-shift to [0, 2^63), +1, divide
    * by 2^63 — an exact power-of-two double): at corpus scale rows
    * virtually never share a key, so the ascending-id tie-break stays a
    * formality instead of a systematic low-id bias at the selection
    * boundary (a small modulus makes collisions routine past ~10^6
    * rows). The salt is a Column so a re-draw study (many salts at
    * once) stays one distributed query. */
  def saltedUniform(id: Column, salt: Column): Column = {
    val h = shiftrightunsigned(xxhash64(id, salt), 1)
    (h.cast("double") + lit(1.0)) / lit(9.223372036854775808e18)
  }

  /** A-ES key u^(1/w). Rows with NULL, NaN, or non-positive weight get
    * key NULL (never sampled — a doc with no weight is not in the
    * draw). The NaN guard matters: Spark orders NaN above every double
    * AND evaluates NaN > 0.0 as true, so an unguarded NaN weight (a
    * 0/0 quality ratio upstream) would deterministically win the
    * sample. */
  def aresKey(id: Column, weight: Column, salt: Column): Column = {
    val w = weight.cast("double")
    when(!isnan(w) && w > 0.0,
      pow(saltedUniform(id, salt), lit(1.0) / w))
  }

  /** Global weighted sample of k rows without replacement. */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
                     k: Int, salt: Long): DataFrame = {
    val keyed = df.withColumn("__ares", aresKey(col(idCol), weight, lit(salt)))
      .filter(col("__ares").isNotNull)
    // orderBy+limit plans as TakeOrderedAndProject; __ares ties broken
    // by id so equal-key rows can't make the cut nondeterministic
    keyed.orderBy(col("__ares").desc, col(idCol)).limit(k).drop("__ares")
  }

  /** Per-group weighted sample: k rows per group (one keyed window
    * shuffle — the stratified training-mix form). */
  def weightedSamplePerGroup(df: DataFrame, groupCols: Seq[String],
                             idCol: String, weight: Column, k: Int,
                             salt: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__ares").desc, col(idCol))
    df.withColumn("__ares", aresKey(col(idCol), weight, lit(salt)))
      .filter(col("__ares").isNotNull)
      .withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") <= k)
      .drop("__ares", "__rnk")
  }
}

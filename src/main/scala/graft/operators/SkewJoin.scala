package graft.operators

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §4.3(d); the 100 TB
  * mitigation when AQE's skew-split isn't enough — e.g. one vehicle id or
  * one null-ish key holding >1% of a fact table).
  *
  * The skewed (large) side gets a deterministic salt in [0, n) derived by
  * hashing its whole row identity; the small side is replicated n times
  * (one row per salt value). The join key becomes (key, salt), so one hot
  * key's rows spread across n shuffle partitions instead of one. Salt
  * choice is `pmod(hash(cols...), n)` — deterministic, no RNG, stable
  * under retries (a task rerun salts identically, required for exactly-
  * once shuffle semantics).
  *
  * Use when: right side is too big to broadcast AND left has hot keys.
  * Cost: right side inflated ×n — pick the smallest n that flattens the
  * skew (AQE's advisory partition size is the gauge).
  */
object SkewJoin extends Logging {

  def saltedEquiJoin(
      skewed: DataFrame,
      other: DataFrame,
      key: String,
      saltBuckets: Int,
      saltCols: Seq[Column] = Seq.empty): DataFrame = {
    val saltBasis = if (saltCols.nonEmpty) saltCols else skewed.columns.toSeq.map(col)
    val left = skewed.withColumn("__salt", pmod(hash(saltBasis: _*), lit(saltBuckets)))
    val right = other.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    left.join(right, Seq(key, "__salt")).drop("__salt")
  }

  /** Targeted variant: salts ONLY detected hot keys, leaving the rest of
    * the join untouched — the production form of [[saltedEquiJoin]] at
    * 100 TB, where blanket ×n replication of the dim side is its own
    * shuffle-volume problem.
    *
    * Detection runs on a seeded `detectSampleFraction` sample of the key
    * column with a proportionally scaled threshold — at 100 TB an exact
    * key count is its own full-table shuffle. The sampled contract,
    * precisely: keys at ≳2× the threshold are detected with overwhelming
    * probability, keys NEAR the threshold are coin-flips — and both error
    * directions are safe (a miss degrades to the plain join, correct but
    * unsalted; a false positive wastes ×n replication on one cold key).
    * When `hotKeyThreshold × detectSampleFraction < 2` the sample is too
    * sparse for even that contract, so detection falls back to the exact
    * count rather than silently weakening. The (by definition tiny)
    * hot-key set is broadcast to both sides. Hot rows get a hashed salt
    * in [0, n); cold rows keep salt 0. The other side replicates rows ×n
    * for hot keys only. With no hot keys this degenerates to the plain
    * equi-join plus the detection scan.
    */
  def targetedSaltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      key: String,
      saltBuckets: Int,
      hotKeyThreshold: Long,
      saltCols: Seq[Column] = Seq.empty,
      detectSampleFraction: Double = 0.01): DataFrame = {
    val saltBasis = if (saltCols.nonEmpty) saltCols else skewed.columns.toSeq.map(col)
    val scaledThreshold = hotKeyThreshold * detectSampleFraction
    val keys = skewed.select(col(key))
    val counted =
      if (scaledThreshold < 2.0) {
        // not silent: this converts O(sample) detection into a full key
        // count — at scale the caller should raise detectSampleFraction
        // so threshold × fraction ≥ 2 and keep the cheap path
        logWarning(s"targetedSaltedJoin: threshold $hotKeyThreshold x " +
          s"fraction $detectSampleFraction < 2 - falling back to EXACT " +
          "key counting (full scan of the skewed side)")
        keys.groupBy(col(key)).count()
          .filter(col("count") > hotKeyThreshold)
      } else keys.sample(withReplacement = false, detectSampleFraction, seed = 42L)
        .groupBy(col(key)).count()
        .filter(col("count") > scaledThreshold)
    val hot = counted.select(col(key), lit(true).as("__hot"))
    val salts = array((0 until saltBuckets).map(lit): _*)
    val left = skewed.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt",
        when(col("__hot"), pmod(hash(saltBasis: _*), lit(saltBuckets))).otherwise(0))
      .drop("__hot")
    val right = other.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt",
        explode(when(col("__hot"), salts).otherwise(array(lit(0)))))
      .drop("__hot")
    left.join(right, Seq(key, "__salt")).drop("__salt")
  }
}

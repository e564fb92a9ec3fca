package graft.operators

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
object SkewJoin {

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
}

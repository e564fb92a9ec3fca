package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Runtime-filter (bloom semi-join reduction) building blocks.
  *
  * The classic 100 TB shuffle-join optimization: before a fact⋈dim
  * shuffle join whose dim side carries a selective predicate, build a
  * bloom filter over the surviving dim keys and pre-filter the fact side
  * with `might_contain` BELOW its shuffle, so the Exchange only carries
  * rows that can possibly match. The bloom's false positives are
  * harmless — the exact join still runs after the pre-filter — so the
  * final result is bit-identical to the unfiltered join and the operator
  * stays fully DuckDB-oracle-able.
  *
  * This is the same plan shape Spark's own `InjectRuntimeFilter` rule
  * produces when its thresholds fire (creation side < 10 MB, application
  * side > 10 GB): a [[BloomFilterAggregate]] over `xxhash64(key)` in a
  * scalar subquery, probed by [[BloomFilterMightContain]]. Building it
  * explicitly makes the reduction deterministic (no size-estimate
  * dependence) and plan-assertable at test scale, where the automatic
  * rule would never trigger.
  *
  * Scale posture: the subquery aggregates the FILTERED dim once into a
  * single bloom value (mergeable map-side partials, one ~`numBits/8`-byte
  * result row), Spark broadcasts the subquery result to every fact task,
  * and the probe is a codegen'd branch-free hash+bit-test in the scan
  * stage — no extra shuffle anywhere.
  */
object BloomProbe {

  /** A bloom filter over `xxhash64(key)` of `build`'s rows, as a scalar
    * subquery Column usable anywhere in another query. An empty build
    * side yields a null bloom; `mightContain` then evaluates to null and
    * a Filter drops every row — exactly the empty-join result. */
  def bloomOf(build: DataFrame, key: Column, expectedItems: Long): Column = {
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(key)), expectedItems)
    val one = build.agg(ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
    ColumnBridge.column(ScalarSubquery(ColumnBridge.analyzedPlan(one)))
  }

  /** Probe predicate: may `probeKey` be in the bloomed build-key set?
    * Hashes with the same seed-42 xxhash64 as [[bloomOf]]. True/false
    * with one-sided error (never a false negative), so it is safe as a
    * pre-filter for an exact join that follows. */
  def mightContain(bloom: Column, probeKey: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom),
      ColumnBridge.expression(xxhash64(probeKey))))
}

package graft

import org.apache.spark.sql.DataFrame

/** Benchmark-honest evaluation: execute the query's OWN physical plan,
  * materializing every output row (and with it every output column),
  * and return the row count.
  *
  * `df.count()` is NOT that measurement: Catalyst re-optimizes the
  * count plan, which prunes scan-side projections down to a bare
  * parquet row-count scan (a language-ID or PII-redaction pass timed
  * that way times an empty `Project`) and eliminates left joins whose
  * right side is an aggregate keyed on the join keys (the join-back
  * shape of per-doc stat queries). Counting the materialized
  * `InternalRow` RDD runs the exact plan `.explain` shows — whole-stage
  * codegen builds each output row as the iterator is drained — and
  * skips only the driver-side result serialization a real consumer
  * would add.
  */
object Materialize {
  def apply(df: DataFrame): Long = df.queryExecution.toRdd.count()
}

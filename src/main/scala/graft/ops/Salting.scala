package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-handling helpers (north rule: "partitioning / shuffle /
  * skew handled explicitly"). The synthetic language mix is deliberately
  * skewed (~80% one language, FIXTURES.md §1); a plain groupBy on such a
  * key funnels the hot group through one reducer for non-partial
  * aggregates (collect_list, exact percentile). Salting splits the hot
  * key across `saltBuckets` reducers, aggregates partially per salted
  * key, then merges the per-salt partials — deterministic (hash-based
  * salt, no rand()).
  */
object Salting {

  /** Deterministic salt in [0, saltBuckets) derived from a row key. */
  def saltCol(rowKey: Column, saltBuckets: Int): Column =
    pmod(xxhash64(rowKey), lit(saltBuckets.toLong)).cast("int")

  /** Skew-safe grouped count: groupBy(key, salt) partial counts →
    * groupBy(key) merge. Equivalent to df.groupBy(key).count() but the
    * first shuffle spreads each hot key over saltBuckets reducers. */
  def saltedCount(
      df: DataFrame,
      keyCol: String,
      rowKeyCol: String,
      saltBuckets: Int = 16): DataFrame =
    df.withColumn("__salt", saltCol(col(rowKeyCol), saltBuckets))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(keyCol))
      .agg(sum("__c").as("cnt"))

  /** Skew-safe grouped sum of a numeric column (same two-phase shape). */
  def saltedSum(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      rowKeyCol: String,
      saltBuckets: Int = 16): DataFrame =
    df.withColumn("__salt", saltCol(col(rowKeyCol), saltBuckets))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum("__s").as("total"))
}

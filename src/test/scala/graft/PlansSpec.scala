package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint

/** Plan-shape guards for the 100 TB invariants: broadcast HINTS may
  * only pin FIXED-cardinality dims (nation/region). Data-proportional
  * tables (customer, orders, lineitem, supplier) must be left to
  * stats/AQE — an explicit hint is honored regardless of size and
  * OOMs at scale instead of degrading to a shuffle join.
  */
class PlansSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  /** Leaf descriptions of every broadcast-hinted subtree. */
  private def hintedLeaves(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case h: ResolvedHint if h.hints.strategy.isDefined => h
    }.flatMap(_.collectLeaves()).map(_.toString)

  test("the only broadcast hints anywhere are fixed-size nation/region") {
    val audited = Seq(
      "dim_customer", "dim_order", "fact_lineitem",
      "q3_shipping_priority", "q5_regional_revenue", "rollup_revenue",
      "q4_returned_priority", "q22_no_orders", "top_orders_per_cust",
      "scd2_merge", "stg_soft_delete", "schema_evolution", "flatten_props")
    // a relation leaf prints its columns — n_/r_ prefixes identify the
    // fixed-size geography dims
    audited.foreach { name =>
      hintedLeaves(SparkEntry.queries(name)(spark, dir)).foreach { leaf =>
        assert(leaf.contains("n_nationkey") || leaf.contains("r_regionkey"),
          s"$name force-broadcasts a data-proportional table: $leaf")
      }
    }
  }

  test("hint detection is not vacuous: dimCustomer does hint nation and region") {
    val leaves = hintedLeaves(pipeline.Models.dimCustomer(spark, dir))
    assert(leaves.exists(_.contains("n_name")))
    assert(leaves.exists(_.contains("r_regionkey")))
  }

  test("incremental cutoff is pushed to the events parquet scan") {
    val df = SparkEntry.queries("cdc_incremental_filter")(spark, dir)
    val scan = df.queryExecution.executedPlan.toString()
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(ts"),
      "cutoff predicate did not reach the parquet scan")
  }
}

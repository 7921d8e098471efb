package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.IO

/** Data-quality expectation report over the relational slice — the
  * pipeline-hygiene operator every production load runs before anything
  * downstream trusts a snapshot: referential integrity (orphan foreign
  * keys), primary-key uniqueness, null contracts, value ranges, and
  * derived-column consistency, one row per check with exact violation
  * counts and the violation rate.
  *
  * Scale shape: each FK check is one left-anti join (the dimension side
  * broadcasts when small; past that it is the same shuffle any FK join
  * pays) collapsed map-side to a 1-row count; PK checks are one
  * key-keyed aggregation emitting only keys with multiplicity > 1; null/
  * range/consistency checks are single-scan conditional counts that
  * fuse into one pass per table. The report itself is |checks| rows —
  * at 100 TB the cost is a handful of column-pruned scans, and the
  * violation-rate trend across snapshots is the artifact a data-quality
  * dashboard stores.
  *
  * Determinism: counts are exact longs; each rate is one double divide
  * with exact-integer operands.
  */
object DataQuality {

  def dqReport(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = IO.table(spark, sfDir, "orders")
    val customer = IO.table(spark, sfDir, "customer")
    val lineitem = IO.table(spark, sfDir, "lineitem")
    val events = IO.table(spark, sfDir, "events")
    val documents = IO.table(spark, sfDir, "documents")

    def check(name: String, violations: DataFrame, total: DataFrame): DataFrame =
      violations.agg(count(lit(1)).as("violations"))
        .crossJoin(total.agg(count(lit(1)).as("total")))
        .select(lit(name).as("check"), col("violations"), col("total"),
          (col("violations").cast("double") / col("total").cast("double"))
            .as("rate"))

    def dupKeys(df: DataFrame, key: String): DataFrame =
      df.groupBy(key).agg(count(lit(1)).as("n")).where(col("n") > 1)

    val checks = Seq(
      // referential integrity: facts must resolve their dimensions
      check("orders_custkey_orphans",
        orders.join(customer,
          orders("o_custkey") === customer("c_custkey"), "left_anti"),
        orders),
      check("lineitem_orderkey_orphans",
        lineitem.join(orders,
          lineitem("l_orderkey") === orders("o_orderkey"), "left_anti"),
        lineitem),
      // primary-key uniqueness (violations counted in KEYS, so the rate
      // reads as "share of keys that collide")
      check("customer_pk_duplicates", dupKeys(customer, "c_custkey"),
        customer.select("c_custkey").distinct()),
      check("orders_pk_duplicates", dupKeys(orders, "o_orderkey"),
        orders.select("o_orderkey").distinct()),
      // null contracts on load-bearing columns
      check("orders_totalprice_nulls",
        orders.where(col("o_totalprice").isNull), orders),
      check("events_props_item_nulls",
        events.where(get_json_object(col("props"), "$.k")
          .cast("long").isNull), events),
      check("documents_lang_nulls",
        documents.where(col("lang").isNull || col("lang") === ""), documents),
      // value-range and derived-column consistency
      check("lineitem_quantity_range",
        lineitem.where(col("l_quantity") < 1 || col("l_quantity") > 50),
        lineitem),
      check("documents_nchars_mismatch",
        documents.where(col("n_chars") =!= length(col("text"))), documents))

    checks.reduce(_ unionByName _).orderBy("check")
  }
}

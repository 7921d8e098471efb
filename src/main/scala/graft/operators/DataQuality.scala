package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.IO

/** Data-quality expectation report over the relational slice — the
  * pipeline-hygiene operator every production load runs before anything
  * downstream trusts a snapshot: referential integrity (orphan foreign
  * keys), primary-key uniqueness, null contracts, value ranges, and
  * derived-column consistency, one row per check with exact violation
  * counts and the violation rate.
  *
  * Scale shape: the checks FUSE — each table is scanned ONCE at row
  * grain with every conditional count it owns (null contracts, value
  * ranges, derived-column consistency, and the FK-orphan flag folded in
  * as one left join against the referenced key set) collapsing
  * map-side into a single 1-row aggregate, plus ONE key-grain pass per
  * PK-checked table whose groupBy serves double duty: it yields the
  * duplicate-key count AND the distinct key set the fact-side join
  * probes. Six scans total for nine checks (orders pays two: row grain
  * and key grain) — at 100 TB the cost is a handful of column-pruned
  * scans, and the violation-rate trend across snapshots is the artifact
  * a data-quality dashboard stores.
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

    // unpivot a 1-row fused aggregate into report rows; each (name,
    // violations, total) triple shares the frame's single computation
    def rows(agg1: DataFrame, checks: (String, Column, Column)*): DataFrame =
      agg1.select(explode(array(checks.map { case (n, v, t) =>
          struct(lit(n).as("check"), v.as("violations"), t.as("total"))
        }: _*)).as("c"))
        .select(col("c.check").as("check"), col("c.violations"),
          col("c.total"),
          // 0-row table: pin the 0/0 rate to NULL via the exact integer
          // condition (the z/t convention) — double 0/0 is the one op
          // whose NULL-vs-NaN outcome is engine-version-dependent
          when(col("c.total") > 0,
            col("c.violations").cast("double") / col("c.total").cast("double"))
            .as("rate"))

    // coalesce: a conditional SUM over an EMPTY table is NULL, but the
    // oracle's scalar COUNT(*) subqueries report 0 violations there —
    // an empty snapshot must read as "0 violations", not "unknown"
    def cnt(cond: Column): Column =
      coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L))

    // key-grain pass, computed once per PK table: duplicate stats AND
    // the distinct key set the fact side probes (two consumers, so the
    // |keys|-row frame materializes once)
    def keyPass(df: DataFrame, key: String): DataFrame =
      df.groupBy(key).agg(count(lit(1)).as("n")).localCheckpoint()

    val custKeys = keyPass(customer, "c_custkey")
    val ordKeys = keyPass(orders, "o_orderkey")

    // row-grain passes: every row-level check a table owns in ONE
    // conditional-sum aggregate; the FK-orphan flag rides the same scan
    // as a left join against the (distinct) key set
    val ordersRow = rows(
      orders.select(col("o_custkey"), col("o_totalprice"))
        .join(custKeys.select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left")
        .agg(count(lit(1)).as("n_rows"),
          cnt(col("c_custkey").isNull).as("v_orphan"),
          cnt(col("o_totalprice").isNull).as("v_nullprice")),
      ("orders_custkey_orphans", col("v_orphan"), col("n_rows")),
      ("orders_totalprice_nulls", col("v_nullprice"), col("n_rows")))

    val lineitemRow = rows(
      lineitem.select(col("l_orderkey"), col("l_quantity"))
        .join(ordKeys.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left")
        .agg(count(lit(1)).as("n_rows"),
          cnt(col("o_orderkey").isNull).as("v_orphan"),
          cnt(col("l_quantity") < 1 || col("l_quantity") > 50).as("v_range")),
      ("lineitem_orderkey_orphans", col("v_orphan"), col("n_rows")),
      ("lineitem_quantity_range", col("v_range"), col("n_rows")))

    val eventsRow = rows(
      events.agg(count(lit(1)).as("n_rows"),
        cnt(get_json_object(col("props"), "$.k").cast("long").isNull)
          .as("v_item")),
      ("events_props_item_nulls", col("v_item"), col("n_rows")))

    val documentsRow = rows(
      documents.agg(count(lit(1)).as("n_rows"),
        cnt(col("lang").isNull || col("lang") === "").as("v_lang"),
        cnt(col("n_chars") =!= length(col("text"))).as("v_nchars")),
      ("documents_lang_nulls", col("v_lang"), col("n_rows")),
      ("documents_nchars_mismatch", col("v_nchars"), col("n_rows")))

    // primary-key uniqueness from the shared key-grain frames
    // (violations counted in KEYS, so the rate reads as "share of keys
    // that collide")
    def pkRow(name: String, keys: DataFrame): DataFrame = rows(
      keys.agg(cnt(col("n") > 1).as("v_dup"), count(lit(1)).as("n_keys")),
      (name, col("v_dup"), col("n_keys")))

    Seq(ordersRow, lineitemRow, eventsRow, documentsRow,
        pkRow("customer_pk_duplicates", custKeys),
        pkRow("orders_pk_duplicates", ordKeys))
      .reduce(_ unionByName _).orderBy("check")
  }
}

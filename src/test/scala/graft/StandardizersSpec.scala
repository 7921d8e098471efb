package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.functions.Standardizers

/** Unit tests for the Part-3 column standardizers — the edge-case table of
  * SURVEY.md §1.4, including the preserved reference quirks.
  */
class StandardizersSpec extends SparkTestBase {
  import spark.implicits._

  private def one(colName: String, value: String, f: org.apache.spark.sql.Column) =
    Seq(value).toDF(colName).select(f.as("out")).collect()(0)

  test("sizeMb parses M-suffixed sizes to megabytes") {
    assert(one("Size", "14M", Standardizers.sizeMb(col("Size"))).getDouble(0) == 14.0)
    assert(one("Size", "2.8M", Standardizers.sizeMb(col("Size"))).getDouble(0) == 2.8)
  }

  test("sizeMb: lowercase k NEVER matches (preserved reference quirk)") {
    // challenge.scala:145 checks uppercase "K"; the data holds lowercase "k",
    // so kilobyte sizes must fall through to null — the committed parquet
    // proves this (1,541 null Sizes).
    assert(one("Size", "201k", Standardizers.sizeMb(col("Size"))).isNullAt(0))
  }

  test("sizeMb parses uppercase K as KB/1024") {
    assert(one("Size", "512K", Standardizers.sizeMb(col("Size"))).getDouble(0) == 0.5)
  }

  test("sizeMb: 'Varies with device' -> null") {
    assert(one("Size", "Varies with device", Standardizers.sizeMb(col("Size"))).isNullAt(0))
  }

  test("priceToEur converts $ prices at 0.9 rate rounded to cents") {
    assert(one("Price", "$4.99", Standardizers.priceToEur(col("Price"))).getDouble(0) == 4.49)
    assert(one("Price", "$0.99", Standardizers.priceToEur(col("Price"))).getDouble(0) == 0.89)
  }

  test("priceToEur: free apps -> 0.0; junk -> null") {
    assert(one("Price", "0", Standardizers.priceToEur(col("Price"))).getDouble(0) == 0.0)
    assert(one("Price", "Everyone", Standardizers.priceToEur(col("Price"))).isNullAt(0))
  }

  test("ratingOrNull: literal NaN string -> null (not Double.NaN)") {
    assert(one("Rating", "NaN", Standardizers.ratingOrNull(col("Rating"))).isNullAt(0))
    assert(one("Rating", "4.5", Standardizers.ratingOrNull(col("Rating"))).getDouble(0) == 4.5)
    assert(one("Rating", "junk", Standardizers.ratingOrNull(col("Rating"))).isNullAt(0))
  }

  test("parseUpdateDate parses 'MMMM d, yyyy'; junk -> null") {
    assert(one("LU", "January 15, 2018", Standardizers.parseUpdateDate(col("LU")))
      .getDate(0).toString == "2018-01-15")
    assert(one("LU", "1.0.19", Standardizers.parseUpdateDate(col("LU"))).isNullAt(0))
  }

  test("splitGenres splits on ';'") {
    val r = one("Genres", "Art & Design;Pretend Play", Standardizers.splitGenres(col("Genres")))
    assert(r.getSeq[String](0) == Seq("Art & Design", "Pretend Play"))
  }

  test("standardizeColumns: na.fill(0) zero-fills the just-nulled Rating (quirk)") {
    val df = Seq(
      ("app1", "NaN", "12", "14M", "0", "Art", "January 15, 2018"),
      ("app2", "4.0", "junk", "201k", "$1.00", "A;B", "nope"))
      .toDF("App", "Rating", "Reviews", "Size", "Price", "Genres", "Last Updated")
    val out = Standardizers.standardizeColumns(df)
      .select("App", "Rating", "Reviews", "Size", "Price", "Genres", "Last_Updated")
      .orderBy("App").collect()
    val r1 = out(0)
    assert(r1.getDouble(1) == 0.0, "NaN rating must be zero-filled by na.fill scope")
    assert(r1.getLong(2) == 12L)
    assert(r1.getDouble(3) == 14.0)
    assert(r1.getDouble(4) == 0.0)
    val r2 = out(1)
    assert(r2.getDouble(1) == 4.0)
    assert(r2.getLong(2) == 0L, "unparseable Reviews must be zero-filled")
    assert(r2.isNullAt(3), "lowercase k size stays null (not zero: fill runs before Size parse)")
    assert(r2.getDouble(4) == 0.9)
    assert(r2.getSeq[String](5) == Seq("A", "B"))
    assert(r2.isNullAt(6))
  }

  test("non-ANSI cast contract: 'nan' string casts to Double.NaN") {
    val r = Seq("nan").toDF("x").select(col("x").cast("double")).collect()(0)
    assert(r.getDouble(0).isNaN, "requires spark.sql.ansi.enabled=false")
  }

  test("session pins ANSI off and UTC") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "false")
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
  }
}

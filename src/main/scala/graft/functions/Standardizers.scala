package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure column standardizers for the Play-Store data model — each one
  * reproduces a cleaning rule from the reference
  * (/root/reference/src/main/scala/tiago/cebola/challenge.scala:141-151),
  * kept as separately-testable units (SURVEY.md §7.1.3).
  *
  * All of them assume NON-ANSI cast semantics (GraftSession pins
  * `spark.sql.ansi.enabled=false`): unparseable string→number yields null,
  * and the literal 'nan' yields Double.NaN.
  *
  * Preserved reference quirks (deliberately NOT fixed — the committed golden
  * artifacts prove these are the shipped semantics, SURVEY.md §1.4):
  *   - sizeMb checks uppercase "K" while the data uses lowercase "k", so
  *     kilobyte sizes fall through to null (challenge.scala:145).
  *   - the Reviews fill uses DataFrame.na.fill(0), which also zero-fills
  *     every other numeric column in scope at that point — including the
  *     just-parsed Rating (1,465 ratings become 0.0).
  */
object Standardizers {

  /** Rating: string → double, with literal-NaN mapped to null rather than
    * Double.NaN (challenge.scala:141-142). A later na.fill(0) then turns
    * those nulls into 0.0.
    */
  def ratingOrNull(c: Column): Column =
    when(!c.isNaN, c.cast("double")).otherwise(lit(null))

  /** Reviews: string → long; unparseable → null (challenge.scala:143). */
  def reviewsToLong(c: Column): Column = c.cast("long")

  /** Size: "14M" → 14.0 MB; "201K" → K/1024 (but data holds lowercase "k",
    * which this intentionally does not match); anything else → null
    * (challenge.scala:144-146).
    */
  def sizeMb(c: Column): Column = {
    val megs = regexp_extract(c, "^(\\d+(?:\\.\\d+)?)M", 1).cast("double")
    val kays = regexp_extract(c, "^(\\d+(?:\\.\\d+)?)K", 1).cast("double") / 1024.0
    when(c.endsWith("M"), megs)
      .otherwise(when(c.endsWith("K"), kays).otherwise(lit(null)))
  }

  /** Price: "$4.99" → 4.99 * 0.9 EUR rounded to cents; "0" → 0.0; anything
    * else → null (challenge.scala:147-149).
    */
  def priceToEur(c: Column): Column = {
    val dollars = regexp_extract(c, "^\\$(\\d+(\\.\\d+)?)", 1).cast("double")
    when(c.contains("$"), round(dollars * lit(0.9), 2))
      .otherwise(when(c === 0, c.cast("double")).otherwise(lit(null)))
  }

  /** Last Updated: "January 15, 2018" → DATE (challenge.scala:150). */
  def parseUpdateDate(c: Column): Column = to_date(c, "MMMM d, yyyy")

  /** Genres: "A;B" → array("A","B") (challenge.scala:151). */
  def splitGenres(c: Column): Column = split(c, ";").cast("array<string>")

  /** The full Part-3 column-standardization stage (challenge.scala:141-151):
    * everything before the per-app aggregation. Note the `.na.fill(0)` right
    * after the Reviews cast — its scope is ALL numeric columns present at
    * that point (Rating included), a preserved reference quirk.
    */
  def standardizeColumns(raw: DataFrame): DataFrame =
    raw
      .withColumn("Rating", ratingOrNull(col("Rating")))
      .withColumn("Reviews", reviewsToLong(col("Reviews")))
      .na.fill(0)
      .withColumn("Size", sizeMb(col("Size")))
      .withColumn("Price", priceToEur(col("Price")))
      .withColumn("Last_Updated", parseUpdateDate(col("Last Updated")))
      .withColumn("Genres", splitGenres(col("Genres")))
}

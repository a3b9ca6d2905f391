package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Planar spatial joins via integer GRID blocking — the
  * radius-search pattern every geo-enrichment pipeline runs
  * ("customers within r of a store", near-duplicate GPS points).
  * The naive form is an O(n·m) cross join with a distance predicate;
  * gridding makes it an EQUI-join: cell side = radius, so any pair
  * within r sits in the same cell or an adjacent one — one side keys
  * its own cell, the other replicates to its 3×3 neighborhood, and
  * the candidate space drops from n·m to the occupied-neighborhood
  * mass (the [[Linkage.blockedFuzzyPairs]] blocking discipline in 2D;
  * the Spark port of the PostGIS `ST_DWithin` + GiST grid walk).
  *
  * All arithmetic is EXACT integers: coordinates are micro-degree
  * longs (|coord| ≤ 1.8e8 ⇒ a squared diff ≤ 1.3e17 and the 2-term
  * sum ≤ 2.6e17 — far inside Long), the predicate is `dist2 ≤ r²`,
  * so the operator replays bit-for-bit in any engine — no trig, no
  * doubles, no boundary flips (the haversine refinement at real-globe
  * scale multiplies by a latitude cosine INSIDE each cell — a
  * per-cell constant that changes the cell metric, never the
  * blocking).
  *
  * At 100 TB the one shuffle is the cell equi-join; the 9× fan-out
  * rides the smaller (`right`) side. A mega-cell (urban density) is
  * the [[Skew.saltedJoin]] case — the cell key is an ordinary join
  * key, so the salting discipline applies unchanged.
  */
object Geo {

  /** All pairs `(left_id, right_id, dist2)` with squared planar
    * distance ≤ radius² — `dist2` in squared coordinate units.
    * Self-join callers pass the same frame twice and get each
    * unordered pair once (`left_id < right_id`); two-table callers
    * get every qualifying (left, right) combination.
    */
  def radiusJoin(left: DataFrame, leftId: String,
                 right: DataFrame, rightId: String,
                 xCol: String, yCol: String, radius: Long,
                 selfJoin: Boolean = false): DataFrame = {
    require(radius >= 1, "radius must be >= 1 coordinate unit")
    val r = lit(radius)
    def cellX(c: Column) = floor(c.cast("long") / r).cast("long")
    val a = left.select(col(leftId).as("left_id"),
      col(xCol).cast("long").as("__ax"), col(yCol).cast("long").as("__ay"),
      cellX(col(xCol)).as("__cx"), cellX(col(yCol)).as("__cy"))
    // the right side replicates to its 3x3 cell neighborhood — any
    // pair within r differs by at most one cell per axis
    val b = right.select(col(rightId).as("right_id"),
        col(xCol).cast("long").as("__bx"), col(yCol).cast("long").as("__by"),
        cellX(col(xCol)).as("__bcx"), cellX(col(yCol)).as("__bcy"))
      .withColumn("__cx", explode(array(
        col("__bcx") - 1, col("__bcx"), col("__bcx") + 1)))
      .withColumn("__cy", explode(array(
        col("__bcy") - 1, col("__bcy"), col("__bcy") + 1)))
      .drop("__bcx", "__bcy")
    val dx = col("__ax") - col("__bx")
    val dy = col("__ay") - col("__by")
    a.join(b, Seq("__cx", "__cy"))
      .filter(if (selfJoin) col("left_id") < col("right_id") else lit(true))
      .withColumn("dist2", dx * dx + dy * dy)
      .filter(col("dist2") <= lit(radius * radius))
      .select(col("left_id"), col("right_id"), col("dist2"))
  }
}

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
  * rides the smaller (`right`) side. A MEGA-CELL (urban density) is
  * contained STRUCTURALLY (r13 verdict ask #2, the
  * [[Linkage.blockedFuzzyPairs]] treatment): cells whose occupancy
  * on either side exceeds `hotCellThreshold` get the side-asymmetric
  * PAIR-GRID salt — each row draws a deterministic id-hash salt
  * s ∈ [0, salts); a left row occupies grid row s ({(s,t) : t}), a
  * right replica grid column s ({(t,s) : t}), so an ordered pairing
  * meets in exactly ONE grid cell, (s_left, s_right), and the dense
  * cell's quadratic candidate work spreads over salts² reducers
  * instead of one. Salting never changes the candidate MULTISET —
  * the grid prunes, salts distribute (GeoSaltSpec drives a crafted
  * mega-cell through both paths and checks multiset equality).
  * Replication cost rides HOT rows only (the hot-cell frame is
  * heavy-hitter-small by definition — ≤ occupancy/threshold cells —
  * and broadcasts); cold cells pin grid cell (0,0) on both sides and
  * take the plain single equi-join, byte-identical to the unsalted
  * form.
  */
object Geo {

  /** All pairs `(left_id, right_id, dist2)` with squared planar
    * distance ≤ radius² — `dist2` in squared coordinate units.
    * Self-join callers pass the same frame twice and get each
    * unordered pair once (`left_id < right_id`); two-table callers
    * get every qualifying (left, right) combination.
    *
    * `hotCellThreshold`: per-cell occupancy (left rows, or right 3×3
    * replicas landing in the cell) above which the pair-grid salt
    * engages; `salts` is the grid side — a hot cell's candidate work
    * spreads over salts² reducers.
    */
  def radiusJoin(left: DataFrame, leftId: String,
                 right: DataFrame, rightId: String,
                 xCol: String, yCol: String, radius: Long,
                 selfJoin: Boolean = false,
                 hotCellThreshold: Long = 100000L,
                 salts: Int = 8): DataFrame = {
    require(radius >= 1, "radius must be >= 1 coordinate unit")
    require(hotCellThreshold >= 1, "hotCellThreshold must be positive")
    require(salts >= 1, "salts must be positive")
    val r = lit(radius)
    def cellX(c: Column) = floor(c.cast("long") / r).cast("long")
    val a0 = left.select(col(leftId).as("left_id"),
      col(xCol).cast("long").as("__ax"), col(yCol).cast("long").as("__ay"),
      cellX(col(xCol)).as("__cx"), cellX(col(yCol)).as("__cy"))
    // the right side replicates to its 3x3 cell neighborhood — any
    // pair within r differs by at most one cell per axis
    val b0 = right.select(col(rightId).as("right_id"),
        col(xCol).cast("long").as("__bx"), col(yCol).cast("long").as("__by"),
        cellX(col(xCol)).as("__bcx"), cellX(col(yCol)).as("__bcy"))
      .withColumn("__cx", explode(array(
        col("__bcx") - 1, col("__bcx"), col("__bcx") + 1)))
      .withColumn("__cy", explode(array(
        col("__bcy") - 1, col("__bcy"), col("__bcy") + 1)))
      .drop("__bcx", "__bcy")
    // hot-cell detection: two partial-agged counts (left per own
    // cell; right per base cell, then the COUNT frame — one row per
    // occupied cell — replicated 3x3 and re-summed, so the 9x ride
    // is on aggregates, not data), max over the sides, threshold.
    // Hot cells are <= totalOccupancy/threshold by construction →
    // the tag frame broadcasts.
    val la = a0.groupBy(col("__cx"), col("__cy"))
      .agg(count(lit(1)).as("__n"))
    val lb = right.select(
        cellX(col(xCol)).as("__bcx"), cellX(col(yCol)).as("__bcy"))
      .groupBy(col("__bcx"), col("__bcy")).agg(count(lit(1)).as("__bn"))
      .withColumn("__cx", explode(array(
        col("__bcx") - 1, col("__bcx"), col("__bcx") + 1)))
      .withColumn("__cy", explode(array(
        col("__bcy") - 1, col("__bcy"), col("__bcy") + 1)))
      .groupBy(col("__cx"), col("__cy")).agg(sum(col("__bn")).as("__n"))
    val hot = la.unionByName(lb)
      .groupBy(col("__cx"), col("__cy")).agg(max(col("__n")).as("__n"))
      .filter(col("__n") > hotCellThreshold)
      .select(col("__cx"), col("__cy")).withColumn("__hot", lit(1))
    // side-asymmetric pair-grid cells (Linkage.blockedFuzzyPairs
    // discipline): left salt-s row occupies {(s,t) : t}, right
    // salt-s replica occupies {(t,s) : t} — an ordered pairing meets
    // in exactly one cell (equal salts included); cold rows pin
    // (0,0) so the plain path meets exactly once too.
    def gridCells(saltC: Column, hotC: Column, leftSide: Boolean): Column =
      when(hotC === 1,
        array((0 until salts).map { t =>
          val tC = lit(t.toLong)
          if (leftSide) struct(saltC.as("i"), tC.as("j"))
          else struct(tC.as("i"), saltC.as("j"))
        }: _*))
        .otherwise(array(struct(lit(0L).as("i"), lit(0L).as("j"))))
    val a = a0.join(broadcast(hot), Seq("__cx", "__cy"), "left")
      .withColumn("__hot", coalesce(col("__hot"), lit(0)))
      .withColumn("__salt",
        when(col("__hot") === 1,
          pmod(xxhash64(col("left_id")), lit(salts.toLong)))
          .otherwise(lit(0L)))
      .withColumn("__cell",
        explode(gridCells(col("__salt"), col("__hot"), leftSide = true)))
      .drop("__hot", "__salt")
    val b = b0.join(broadcast(hot), Seq("__cx", "__cy"), "left")
      .withColumn("__hot", coalesce(col("__hot"), lit(0)))
      .withColumn("__salt",
        when(col("__hot") === 1,
          pmod(xxhash64(col("right_id")), lit(salts.toLong)))
          .otherwise(lit(0L)))
      .withColumn("__cell",
        explode(gridCells(col("__salt"), col("__hot"), leftSide = false)))
      .drop("__hot", "__salt")
    val dx = col("__ax") - col("__bx")
    val dy = col("__ay") - col("__by")
    a.join(b, Seq("__cx", "__cy", "__cell"))
      .filter(if (selfJoin) col("left_id") < col("right_id") else lit(true))
      .withColumn("dist2", dx * dx + dy * dy)
      .filter(col("dist2") <= lit(radius * radius))
      .select(col("left_id"), col("right_id"), col("dist2"))
  }
}

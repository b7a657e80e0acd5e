package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import GeoFunctions._

/** Grid-partitioned spatial join (SURVEY §4.3).
  *
  * Semantics: `left ⋈_{ST_Intersects(lg, rg)} right` — the reference's
  * zip-code↔district overlap (reference: scripts/census/zip_code_overlap.py:33-38),
  * which PostGIS answers with a GiST index and the reference drives with
  * one query per person.
  *
  * Physical plan here: each geometry's envelope is exploded into the set
  * of fixed-size grid cells it covers; candidates are found with a plain
  * equi-join on cell id (a hash shuffle that scales horizontally — no
  * nested loop); `dropDuplicates` collapses multi-cell hits; the exact
  * JTS predicate filters false positives. This is pure DataFrame code —
  * Catalyst plans the cell join like any other equi-join (AQE handles
  * cell skew, e.g. a geometry spanning many cells).
  */
object SpatialJoin {

  /** Explode a WKB geometry column into covered grid-cell keys. */
  private def cellKeys(geom: Column, cellSize: Double): Column = {
    val env = stEnvelope(geom)
    val minCx = floor(env.getItem(0) / cellSize).cast("long")
    val minCy = floor(env.getItem(1) / cellSize).cast("long")
    val maxCx = floor(env.getItem(2) / cellSize).cast("long")
    val maxCy = floor(env.getItem(3) / cellSize).cast("long")
    flatten(transform(sequence(minCx, maxCx), cx =>
      transform(sequence(minCy, maxCy), cy =>
        struct(cx.as("cx"), cy.as("cy")))))
  }

  /** Inner spatial join on ST_Intersects. `left`/`right` must each carry a
    * WKB geometry column named by `leftGeom`/`rightGeom`; all other columns
    * are preserved (names must not collide). */
  def intersectsJoin(left: DataFrame, right: DataFrame,
      leftGeom: String, rightGeom: String, cellSize: Double): DataFrame = {
    val lKeys = left.columns.filter(_ != leftGeom).map(col).toIndexedSeq
    val rKeys = right.columns.filter(_ != rightGeom).map(col).toIndexedSeq
    val l = left.withColumn("__cell", explode(cellKeys(col(leftGeom), cellSize)))
    val r = right.withColumn("__cell", explode(cellKeys(col(rightGeom), cellSize)))
    l.join(r, "__cell")
      .filter(stIntersects(col(leftGeom), col(rightGeom)))
      .select((lKeys ++ rKeys): _*)
      .dropDuplicates()
  }
}

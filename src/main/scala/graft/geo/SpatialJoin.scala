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
  * Physical plan here, tuned so nothing wide crosses a shuffle twice:
  *  1. each side is keyed by a row id; `(id, cell)` pairs are produced by
  *     [[GeoFunctions.stCoveredCells]] — ONE WKB deserialization per row,
  *     and only ids + cell keys enter the candidate exchange (geometry
  *     blobs never fan out per covered cell);
  *  2. candidates are a plain equi-join on cell id (hash shuffle, scales
  *     horizontally, AQE handles cell skew), deduplicated on the compact
  *     `(lid, rid)` pair BEFORE any geometry is rejoined — a multi-cell
  *     overlap costs one pair row, not one geometry copy per shared cell;
  *  3. the exact JTS predicate runs once per unique candidate pair, on
  *     geometries re-joined by id;
  *  4. surviving pairs pull the full rows back by id.
  */
object SpatialJoin {

  /** 128-bit content id (two independently-seeded xxhash64 over every
    * column): stable across plan re-evaluations, unlike
    * monotonically_increasing_id, whose values depend on intra-partition
    * row order — this plan reads each input in three branches, and a
    * non-deterministic input (anything post-shuffle) would correlate
    * DIFFERENT rows across branches under an order-derived id. Identical
    * duplicate rows share an id by construction; the geometry frames are
    * deduped per id and the final joins restore row multiplicity. */
  private def contentId(cols: Seq[Column]): Column =
    struct(xxhash64(cols: _*).as("h1"), xxhash64((lit(613) +: cols): _*).as("h2"))

  /** Inner spatial join on ST_Intersects. `left`/`right` must each carry a
    * WKB geometry column named by `leftGeom`/`rightGeom`; all other columns
    * are preserved (names must not collide). Join multiplicity follows SQL
    * join semantics: each intersecting row pair emits one output row. */
  def intersectsJoin(left: DataFrame, right: DataFrame,
      leftGeom: String, rightGeom: String, cellSize: Double): DataFrame = {
    val lKeys = left.columns.filter(_ != leftGeom).map(col).toIndexedSeq
    val rKeys = right.columns.filter(_ != rightGeom).map(col).toIndexedSeq
    val l = left.withColumn("__lid", contentId(left.columns.map(col).toIndexedSeq))
    val r = right.withColumn("__rid", contentId(right.columns.map(col).toIndexedSeq))
    val lGeoms = l.select(col("__lid"), col(leftGeom)).dropDuplicates("__lid")
    val rGeoms = r.select(col("__rid"), col(rightGeom)).dropDuplicates("__rid")
    val lCells = lGeoms.select(col("__lid"),
      explode(stCoveredCells(col(leftGeom), lit(cellSize))).as("__cell"))
    val rCells = rGeoms.select(col("__rid"),
      explode(stCoveredCells(col(rightGeom), lit(cellSize))).as("__cell"))
    val pairs = lCells.join(rCells, "__cell")
      .select(col("__lid"), col("__rid"))
      .dropDuplicates("__lid", "__rid")
    val verified = pairs
      .join(lGeoms, "__lid")
      .join(rGeoms, "__rid")
      .filter(stIntersects(col(leftGeom), col(rightGeom)))
      .select(col("__lid"), col("__rid"))
    verified.join(l, "__lid").join(r, "__rid")
      .select((lKeys ++ rKeys): _*)
  }
}

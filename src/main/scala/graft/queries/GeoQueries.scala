package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.geo.GeoFunctions._
import graft.geo.SpatialJoin

/** Geospatial operator surface (SURVEY §2.8, §4.3) phrased over the
  * synthetic tables: deterministic synthetic geometries — customer points
  * on a 97×89 lattice, nation rectangles tiling a 5×5 grid — so the
  * spatial predicate has an arithmetic DuckDB oracle while the Spark side
  * exercises the full GeoJSON→JTS→WKB→grid-join machinery.
  */
object GeoQueries {

  /** nation rectangles: cell (k%5, k/5), size 20×18, as GeoJSON. */
  private def nationRects(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation").select(col("n_nationkey"),
      stGeomFromGeoJson(format_string(
        """{"type":"Polygon","coordinates":[[[%d,%d],[%d,%d],[%d,%d],[%d,%d],[%d,%d]]]}""",
        (col("n_nationkey") % 5) * 20, (col("n_nationkey").cast("int") / 5).cast("int") * 18,
        (col("n_nationkey") % 5) * 20 + 20, (col("n_nationkey").cast("int") / 5).cast("int") * 18,
        (col("n_nationkey") % 5) * 20 + 20, (col("n_nationkey").cast("int") / 5).cast("int") * 18 + 18,
        (col("n_nationkey") % 5) * 20, (col("n_nationkey").cast("int") / 5).cast("int") * 18 + 18,
        (col("n_nationkey") % 5) * 20, (col("n_nationkey").cast("int") / 5).cast("int") * 18)).as("geom"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // G2/J3 — grid-partitioned ST_Intersects spatial join (point in poly)
    "q30_spatial_join" -> ((s, dir) => {
      val pts = t(s, dir, "customer").select(col("c_custkey"),
        stPoint((col("c_custkey") % 97).cast("double"),
          ((col("c_custkey") * 7) % 89).cast("double")).as("pt"))
      SpatialJoin.intersectsJoin(pts, nationRects(s, dir), "pt", "geom", cellSize = 16.0)
        .orderBy(col("c_custkey"), col("n_nationkey"))
    }),

    // G1/G3 — GeoJSON parse, centroid, area. stCentroidOnce evaluates the
    // centroid UDF once per row even though both coordinates are projected
    // (plain stCentroid would be re-inlined per getItem by CollapseProject).
    "q31_geo_centroid" -> ((s, dir) => {
      nationRects(s, dir)
        .select(col("n_nationkey"), stCentroidOnce(col("geom")).as("c"),
          stArea(col("geom")).as("area"))
        .select(col("n_nationkey"),
          col("c").getItem(0).as("cx"), col("c").getItem(1).as("cy"), col("area"))
        .orderBy(col("n_nationkey"))
    }),

    // The reference's flagship composite — shapefile areas, YAML people,
    // JSON bills + vote events (J1/J2), spatial person↔zip edges (J3),
    // five-table warehouse upsert (K1/K2) — run end-to-end over packaged
    // deterministic fixtures; one fingerprint row per table. Independent
    // of the sfDir by design (the fixtures ARE the reference shapes);
    // golden-pinned, so a regression anywhere in the chain moves a hash
    "q219_civic_e2e" -> ((s, _) => graft.pipelines.CivicE2e.summary(s))
  )

  val oracle: Map[String, String] = Map(
    "q30_spatial_join" ->
      """SELECT c_custkey, n_nationkey
        |FROM customer, nation
        |WHERE (c_custkey % 97) >= (n_nationkey % 5) * 20
        |  AND (c_custkey % 97) <= (n_nationkey % 5) * 20 + 20
        |  AND ((c_custkey * 7) % 89) >= (n_nationkey // 5) * 18
        |  AND ((c_custkey * 7) % 89) <= (n_nationkey // 5) * 18 + 18
        |ORDER BY c_custkey, n_nationkey""".stripMargin,
    "q31_geo_centroid" ->
      """SELECT n_nationkey,
        |  CAST((n_nationkey % 5) * 20 + 10 AS DOUBLE) AS cx,
        |  CAST((n_nationkey // 5) * 18 + 9 AS DOUBLE) AS cy,
        |  CAST(360 AS DOUBLE) AS area
        |FROM nation ORDER BY n_nationkey""".stripMargin
  )
}

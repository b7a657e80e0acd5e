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
    "q219_civic_e2e" -> ((s, _) => graft.pipelines.CivicE2e.summary(s)),

    // Oracle-grounded civic stages (round 14 — q219's fingerprint rows
    // hash with Spark's xxhash64, which DuckDB cannot reproduce, so the
    // composite stays golden; these two queries put the STAGE semantics
    // under the DuckDB hash compare instead — see CivicOracle's header)
    "q226_civic_roles" ->
      ((s, _) => graft.pipelines.CivicOracle.peopleResolved(s)),
    "q227_civic_vote_join" ->
      ((s, _) => graft.pipelines.CivicOracle.voteJoin(s))
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
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    // independent recompute of the W2 resolution + area derivation from
    // the same role rows the YAML fixture declares (CivicOracle keeps
    // the two in lockstep: fixture drift fails this hash compare)
    "q226_civic_roles" ->
      """WITH roles(id, name, given_name, family_name, pos, rtype,
        |           district, jurisdiction, start_date, end_date) AS (VALUES
        |  ('ocd-person/baldwin','Tammy Baldwin','Tammy','Baldwin',0,'upper','Wisconsin','ocd-jurisdiction/country:us/government','2023-01-03','2029-01-03'),
        |  ('ocd-person/casey','Bob Casey','Bob','Casey',0,'mayor','Scranton','ocd-jurisdiction/country:us/government','2020-01-01','2030-01-01'),
        |  ('ocd-person/casey','Bob Casey','Bob','Casey',1,'lower','PA-2','ocd-jurisdiction/country:us/government','2023-01-03','2027-01-03'),
        |  ('ocd-person/casey','Bob Casey','Bob','Casey',2,'upper','Pennsylvania','ocd-jurisdiction/country:us/government','2021-01-03',NULL),
        |  ('ocd-person/shapiro','Josh Shapiro','Josh','Shapiro',0,'lower','PA-3','ocd-jurisdiction/country:us/government','2019-01-03',NULL),
        |  ('ocd-person/shapiro','Josh Shapiro','Josh','Shapiro',1,'upper','Pennsylvania','ocd-jurisdiction/country:us/government','2025-01-03',NULL),
        |  ('ocd-person/ward','Kim Ward','Kim','Ward',0,'lower','PA-4','ocd-jurisdiction/country:us/government','2015-01-03','2019-01-03'),
        |  ('ocd-person/ward','Kim Ward','Kim','Ward',1,'upper','Pennsylvania','ocd-jurisdiction/country:us/government',NULL,'2029-01-03'),
        |  ('ocd-person/dual','Dana Dual','Dana','Dual',0,'upper','Pennsylvania','ocd-jurisdiction/country:us/government','2023-01-03','2029-01-03'),
        |  ('ocd-person/dual','Dana Dual','Dana','Dual',1,'lower','PA-5','ocd-jurisdiction/country:us/government','2023-01-03','2029-01-03'),
        |  ('ocd-person/general','Pat General','Pat','General',0,'lower','MT-AL','ocd-jurisdiction/country:us/government','2023-01-03','2027-01-03')),
        |states(state_name, abbrev) AS (VALUES
        |  ('Wisconsin','WI'),('Pennsylvania','PA'),('Montana','MT')),
        |counts AS (SELECT id, count(*) AS nr FROM roles GROUP BY 1),
        |singles AS (
        |  SELECT r.id, r.name, r.given_name, r.family_name, r.rtype,
        |    r.district, r.jurisdiction, 'sole' AS role_status
        |  FROM roles r JOIN counts c ON r.id = c.id WHERE c.nr = 1),
        |scored AS (
        |  SELECT r.*, CAST(r.start_date AS TIMESTAMP) AS st,
        |    CAST(r.end_date AS TIMESTAMP) AS en,
        |    CASE
        |      WHEN r.start_date IS NOT NULL AND r.end_date IS NOT NULL THEN
        |        CASE WHEN CAST(r.start_date AS TIMESTAMP) <= TIMESTAMP '2026-01-01'
        |              AND TIMESTAMP '2026-01-01' <= CAST(r.end_date AS TIMESTAMP)
        |             THEN 2 ELSE 0 END
        |      WHEN r.start_date IS NOT NULL THEN 1
        |      WHEN r.end_date IS NOT NULL THEN
        |        CASE WHEN CAST(r.end_date AS TIMESTAMP) >= TIMESTAMP '2026-01-01'
        |             THEN 2 ELSE 0 END
        |      ELSE 1 END AS priority
        |  FROM roles r JOIN counts c ON r.id = c.id
        |  WHERE c.nr > 1 AND r.rtype <> 'mayor'),
        |resolved AS (
        |  SELECT id, name, given_name, family_name, rtype, district,
        |    jurisdiction,
        |    CASE WHEN priority = 2 THEN 'current' ELSE 'potential' END
        |      AS role_status,
        |    row_number() OVER (PARTITION BY id ORDER BY priority DESC,
        |      CASE WHEN priority = 2 THEN -pos ELSE pos END DESC) AS rn
        |  FROM scored WHERE priority > 0),
        |sel AS (
        |  SELECT id, name, given_name, family_name, rtype, district,
        |    jurisdiction, role_status FROM singles
        |  UNION ALL
        |  SELECT id, name, given_name, family_name, rtype, district,
        |    jurisdiction, role_status FROM resolved WHERE rn = 1)
        |SELECT s.id, s.name, s.given_name, s.family_name,
        |  CASE WHEN s.rtype = 'lower' THEN 'House' ELSE 'Senate' END
        |    AS chamber,
        |  s.role_status,
        |  CASE WHEN s.rtype = 'lower' THEN
        |    'ocd-division/country:us/state:'
        |      || lower(split_part(s.district, '-', 1)) || '/cd:'
        |      || lower(CASE WHEN split_part(s.district, '-', 2) = 'AL'
        |                    THEN 'at-large'
        |                    ELSE split_part(s.district, '-', 2) END)
        |  ELSE 'ocd-division/country:us/state:' || lower(st.abbrev) END
        |    AS constituent_area_id,
        |  replace(replace(s.jurisdiction, 'jurisdiction', 'division'),
        |    '/government', '') AS jurisdiction_area_id
        |FROM sel s LEFT JOIN states st ON s.district = st.state_name
        |ORDER BY s.id""".stripMargin,
    // independent recompute of the J2 routing + F14 pseudo-JSON + F16
    // digit-normalized session join from the same event rows
    "q227_civic_vote_join" ->
      """WITH bills(identifier, session_raw) AS (VALUES ('HB 102', '119th')),
        |events(identifier, session_raw, motion_text, result, bill,
        |       organization) AS (VALUES
        |  ('roll-22','119','passage','pass','~{"identifier": "HB 102"}','~{"classification": "upper"}'),
        |  ('roll-23','119','procedural','pass','~{"identifier": "HB 102"}','~{"classification": "upper"}'),
        |  ('roll-99','119','orphan','fail','~{"identifier": "HB 999"}','~{"classification": "upper"}')),
        |votes(event_identifier, option) AS (VALUES
        |  ('roll-22','yes'),('roll-22','yes'),('roll-22','no')),
        |billkeys AS (
        |  SELECT identifier,
        |    regexp_replace(session_raw, '[^0-9]', '', 'g') AS session
        |  FROM bills),
        |parsed AS (
        |  SELECT identifier,
        |    regexp_replace(session_raw, '[^0-9]', '', 'g') AS session,
        |    motion_text, result,
        |    json_extract_string(substr(bill, 2), '$.identifier')
        |      AS bill_identifier,
        |    json_extract_string(substr(organization, 2), '$.classification')
        |      AS chamber
        |  FROM events),
        |vc AS (
        |  SELECT event_identifier, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN option = 'yes' THEN 1 ELSE 0 END) AS BIGINT) AS y,
        |    CAST(sum(CASE WHEN option = 'no' THEN 1 ELSE 0 END) AS BIGINT) AS nn
        |  FROM votes GROUP BY 1)
        |SELECT p.identifier, p.session, p.motion_text, p.result, p.chamber,
        |  'kept' AS routed,
        |  coalesce(vc.n, 0) AS n_votes, coalesce(vc.y, 0) AS n_yes,
        |  coalesce(vc.nn, 0) AS n_no
        |FROM parsed p
        |  JOIN billkeys b ON p.bill_identifier = b.identifier
        |    AND p.session = b.session
        |  LEFT JOIN vc ON p.identifier = vc.event_identifier
        |UNION ALL
        |SELECT p.identifier, p.session, CAST(NULL AS VARCHAR),
        |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'dropped',
        |  CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |FROM parsed p
        |WHERE NOT EXISTS (SELECT 1 FROM billkeys b
        |  WHERE p.bill_identifier = b.identifier AND p.session = b.session)
        |ORDER BY identifier""".stripMargin
  )
}

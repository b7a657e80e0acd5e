package graft.geo

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory, LinearRing, Polygon}
import org.locationtech.jts.io.{WKBReader, WKBWriter}

/** Minimal GeoJSON geometry codec over jts-core (which ships no GeoJSON
  * IO of its own). Supports Point, Polygon (with holes), MultiPolygon —
  * the geometry types the reference ingests from TIGER shapefiles and
  * NYT precinct files (reference: scripts/census/federal_house_districts.py:109,
  * scripts/elections/nytimes_precincts.py:57-83).
  *
  * Geometries are stored in the warehouse as WKB binary columns; parsing
  * happens once at ingest.
  */
object GeoJson {
  private val mapper = new ObjectMapper()
  private val gf = new GeometryFactory()

  def parse(geojson: String): Geometry = {
    val node = mapper.readTree(geojson)
    val geomNode =
      if (node.has("geometry")) node.get("geometry") // Feature wrapper
      else node
    parseGeometry(geomNode)
  }

  private def parseGeometry(node: JsonNode): Geometry = {
    val coords = node.get("coordinates")
    node.get("type").asText() match {
      case "Point" =>
        gf.createPoint(coordinate(coords))
      case "MultiPoint" =>
        gf.createMultiPointFromCoords(ring(coords))
      case "LineString" =>
        gf.createLineString(ring(coords))
      case "Polygon" =>
        polygon(coords)
      case "MultiPolygon" =>
        val polys = (0 until coords.size()).map(i => polygon(coords.get(i)))
        gf.createMultiPolygon(polys.toArray)
      case "GeometryCollection" =>
        val geoms = node.get("geometries")
        gf.createGeometryCollection(
          (0 until geoms.size()).map(i => parseGeometry(geoms.get(i))).toArray)
      case other =>
        throw new IllegalArgumentException(s"unsupported GeoJSON type: $other")
    }
  }

  private def coordinate(node: JsonNode): Coordinate =
    new Coordinate(node.get(0).asDouble(), node.get(1).asDouble())

  private def ring(node: JsonNode): Array[Coordinate] =
    (0 until node.size()).map(i => coordinate(node.get(i))).toArray

  private def polygon(coords: JsonNode): Polygon = {
    val shell = gf.createLinearRing(ring(coords.get(0)))
    val holes: Array[LinearRing] =
      (1 until coords.size()).map(i => gf.createLinearRing(ring(coords.get(i)))).toArray
    gf.createPolygon(shell, holes)
  }

  def toWkb(g: Geometry): Array[Byte] = new WKBWriter().write(g)

  def fromWkb(bytes: Array[Byte]): Geometry = new WKBReader(gf).read(bytes)

  def pointWkb(x: Double, y: Double): Array[Byte] =
    toWkb(gf.createPoint(new Coordinate(x, y)))
}

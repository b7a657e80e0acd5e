package graft.geo

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class GeoSpec extends SparkTestBase {
  import spark.implicits._

  test("GeoJSON polygon with hole: area and round-trip") {
    val gj = """{"type":"Polygon","coordinates":[
      [[0,0],[4,0],[4,4],[0,4],[0,0]],
      [[1,1],[2,1],[2,2],[1,2],[1,1]]]}"""
    val g = GeoJson.parse(gj)
    assert(g.getArea == 15.0)
    val rt = GeoJson.fromWkb(GeoJson.toWkb(g))
    assert(rt.equalsExact(g))
  }

  test("GeoJSON MultiPolygon and Feature wrapper") {
    val gj = """{"type":"Feature","properties":{"x":1},"geometry":
      {"type":"MultiPolygon","coordinates":[
        [[[0,0],[2,0],[2,2],[0,2],[0,0]]],
        [[[10,10],[12,10],[12,12],[10,12],[10,10]]]]}}"""
    val g = GeoJson.parse(gj)
    assert(g.getNumGeometries == 2)
    assert(g.getArea == 8.0)
  }

  test("grid spatial join equals brute-force nested loop") {
    val pts = (0 until 50).map(i => (i.toLong, (i % 13).toDouble, (i % 7).toDouble))
      .toDF("pid", "x", "y")
      .select($"pid", GeoFunctions.stPoint($"x", $"y").as("pt"))
    val rects = Seq(
      (100L, """{"type":"Polygon","coordinates":[[[0,0],[5,0],[5,5],[0,5],[0,0]]]}"""),
      (200L, """{"type":"Polygon","coordinates":[[[4,2],[9,2],[9,6],[4,6],[4,2]]]}"""),
      (300L, """{"type":"Polygon","coordinates":[[[40,40],[41,40],[41,41],[40,41],[40,40]]]}"""))
      .toDF("rid", "gj")
      .select($"rid", GeoFunctions.stGeomFromGeoJson($"gj").as("geom"))

    val grid = SpatialJoin.intersectsJoin(pts, rects, "pt", "geom", cellSize = 3.0)
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pts.crossJoin(rects)
      .filter(GeoFunctions.stIntersects($"pt", $"geom"))
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(grid == brute)
    assert(brute.nonEmpty)
    assert(!brute.exists(_._2 == 300L))
  }

  test("centroid and envelope") {
    val df = Seq(("""{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,2],[0,2],[0,0]]]}"""))
      .toDF("gj").select(GeoFunctions.stGeomFromGeoJson($"gj").as("g"))
    val row = df.select(
      GeoFunctions.stCentroid($"g").as("c"),
      GeoFunctions.stEnvelope($"g").as("e"),
      GeoFunctions.stArea($"g").as("a")).head
    assert(row.getSeq[Double](0) == Seq(2.0, 1.0))
    assert(row.getSeq[Double](1) == Seq(0.0, 0.0, 4.0, 2.0))
    assert(row.getDouble(2) == 8.0)
  }
}

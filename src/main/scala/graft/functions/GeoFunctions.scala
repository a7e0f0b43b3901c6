package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's one non-trivial scalar computation: the
  * haversine-distance derived column the test-suite transformer adds
  * (SURVEY.md §2.8; target.avsc:53-55 over source.avsc lat/lon
  * fields). Pure built-in trig — codegen'd, no UDF. */
object GeoFunctions {

  private val EarthRadiusMeters = 6371000.0

  /** Great-circle distance in meters between (lat1,lon1) and
    * (lat2,lon2) in degrees. */
  def haversineDistance(lat1: Column, lon1: Column,
      lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusMeters) * atan2(sqrt(a), sqrt(-a + 1))
  }
}

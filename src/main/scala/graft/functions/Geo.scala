package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial column expressions (F14). */
object Geo {

  val EarthRadiusKm = 6371.0

  /** Great-circle (haversine) distance in km, composed entirely from
    * codegen'd built-ins — no UDF (SURVEY §2.7 F14). The reference
    * uses geopy's ellipsoid geodesic (random_walk_utils.py:27);
    * sphere-vs-ellipsoid delta is <= 0.5 %, irrelevant at the
    * reference's 155,000 km threshold (Earth max is ~20,015 km).
    * The expression tree is mirrored verbatim in the DuckDB oracle so
    * both engines evaluate the identical double formula. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val a = pow(sin(radians(lat2 - lat1) / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(radians(lon2 - lon1) / 2), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }
}

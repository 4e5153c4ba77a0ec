package graft.schema

import org.apache.spark.sql.types._

/** Explicit schema-on-write for the flight event stream — mirrors the
  * reference's hand-declared StructType
  * (/root/reference/apps/spark_app/flight_stream.py:106-144): all leaves
  * StringType except the two delay_min IntegerTypes; timestamps arrive as
  * strings and are normalized downstream.
  */
/** Typed mirror of [[FlightSchemas.eventSchema]] for the `Dataset[T]`
  * API surface: compile-time field access where type safety matters more
  * than the last bit of codegen (typed lambdas leave whole-stage codegen;
  * the hot ingest path stays on the untyped Column API by design). */
case class AirlineRef(iata: Option[String], icao: Option[String],
    name: Option[String])
case class FlightRef(number: Option[String], iata: Option[String],
    icao: Option[String])
case class EndpointRef(airport: Option[String], iata: Option[String],
    icao: Option[String], gate: Option[String], terminal: Option[String],
    schedule: Option[String], estimated: Option[String],
    actual: Option[String], delay_min: Option[Int])
case class FlightEvent(flight_key: Option[String], flight_date: Option[String],
    status: Option[String], airline: Option[AirlineRef],
    flight: Option[FlightRef], departure: Option[EndpointRef],
    arrival: Option[EndpointRef], ingest_time: Option[String],
    source: Option[String])

object FlightSchemas {

  private def ep = StructType(Seq(
    StructField("airport", StringType),
    StructField("iata", StringType),
    StructField("icao", StringType),
    StructField("gate", StringType),
    StructField("terminal", StringType),
    StructField("schedule", StringType),
    StructField("estimated", StringType),
    StructField("actual", StringType),
    StructField("delay_min", IntegerType)))

  val eventSchema: StructType = StructType(Seq(
    StructField("flight_key", StringType),
    StructField("flight_date", StringType),
    StructField("status", StringType),
    StructField("airline", StructType(Seq(
      StructField("iata", StringType),
      StructField("icao", StringType),
      StructField("name", StringType)))),
    StructField("flight", StructType(Seq(
      StructField("number", StringType),
      StructField("iata", StringType),
      StructField("icao", StringType)))),
    StructField("departure", ep),
    StructField("arrival", ep),
    StructField("ingest_time", StringType),
    StructField("source", StringType)))

  /** Flat staging-table column order
    * (/root/reference/db/00_warehous.sql:23-60). */
  val stagingColumns: Seq[String] = Seq(
    "flight_key", "flight_date", "status", "ingest_time",
    "flight_number", "flight_iata", "flight_icao",
    "airline_iata", "airline_icao", "airline_name",
    "dep_airport", "dep_airport_iata", "dep_airport_icao",
    "dep_terminal", "dep_gate",
    "dep_scheduled", "dep_estimated", "dep_actual", "dep_delay_min",
    "arr_airport", "arr_airport_iata", "arr_airport_icao",
    "arr_terminal", "arr_gate",
    "arr_scheduled", "arr_estimated", "arr_actual", "arr_delay_min")
}

package graft

import org.apache.spark.sql.functions._
import graft.stream.FlightStream

/** S5: the JDBC batch-append sink (/root/reference/apps/spark_app/
  * flight_stream.py:312-322) against a real database — embedded Derby
  * in-memory (on the provided Spark classpath), so the executable
  * evidence covers the actual `format("jdbc")` write path: connection
  * per partition, multi-batch statement flushing (`batchsize`),
  * READ_COMMITTED isolation, append-not-overwrite semantics.
  */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  // keep Derby's log out of the repo root
  System.setProperty("derby.system.home",
    java.nio.file.Files.createTempDirectory("derby-home").toString)

  private def url(db: String) = s"jdbc:derby:memory:$db;create=true"

  private def staged(n: Int) =
    (1 to n).map(i => (s"AA$i${"_"}2024-05-09", s"AA$i", i * 1.5,
      java.sql.Timestamp.valueOf(s"2024-05-09 10:0${i % 10}:00")))
      .toDF("flight_key", "flight_number", "dep_delay_min", "ingest_time")

  test("jdbcAppend round-trips rows through a real JDBC database") {
    val df = staged(7)
    FlightStream.jdbcAppend(df, url("roundtrip"), "staging", "app", "app")
    // pushDownPredicate off: Spark's Derby dialect writes strings as
    // CLOB, and Derby can't compare CLOB = 'literal' server-side
    val back = spark.read.format("jdbc")
      .option("url", url("roundtrip")).option("dbtable", "staging")
      .option("pushDownPredicate", "false").load()
    assert(back.count() === 7)
    assert(back.columns.sorted ===
      Array("dep_delay_min", "flight_key", "flight_number", "ingest_time"))
    val row = back.filter(col("flight_key") === "AA3_2024-05-09").head()
    assert(row.getAs[String]("flight_number") === "AA3")
    assert(row.getAs[Double]("dep_delay_min") === 4.5)
  }

  test("append mode accumulates, never overwrites (the reference's mode)") {
    FlightStream.jdbcAppend(staged(4), url("appendmode"), "staging", "app", "app")
    FlightStream.jdbcAppend(staged(4), url("appendmode"), "staging", "app", "app")
    val back = spark.read.format("jdbc")
      .option("url", url("appendmode")).option("dbtable", "staging").load()
    assert(back.count() === 8) // two cycles, both present
  }

  test("batchsize smaller than the row count exercises multi-batch flushes") {
    // 9 rows / batchSize 2 = 5 executeBatch calls per partition chunk;
    // a broken batch boundary would lose or duplicate the odd tail row
    FlightStream.jdbcAppend(staged(9), url("batched"), "staging", "app", "app",
      batchSize = 2)
    val back = spark.read.format("jdbc")
      .option("url", url("batched")).option("dbtable", "staging").load()
    assert(back.count() === 9)
    assert(back.select(countDistinct(col("flight_key"))).head().getLong(0) === 9)
  }
}

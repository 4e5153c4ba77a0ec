package graft

import graft.stream.FlightStream

/** Executable evidence for the Kafka source contract (S2/S3) that does
  * not need a broker or the kafka connector jars: the reference
  * subscription (flight_stream.py:93-100) is format=kafka, subscribe to
  * ONE topic, startingOffsets=latest, failOnDataLoss=false. The waiver
  * for S3 thus narrows to broker I/O only — the reader construction
  * itself is asserted here.
  */
class KafkaContractSpec extends SparkSpec {

  test("kafkaSourceOptions: the reference's exact subscription options") {
    val o = FlightStream.kafkaSourceOptions("broker:9092", "flights")
    assert(o("kafka.bootstrap.servers") == "broker:9092")
    assert(o("subscribe") == "flights") // subscribe, NOT subscribePattern
    assert(o("startingOffsets") == "latest")
    assert(o("failOnDataLoss") == "false")
    assert(o.size == 4, s"unexpected extra options: $o")
    assert(FlightStream.KafkaSourceFormat == "kafka")
  }

  test("kafkaReader: the built DataStreamReader carries format=kafka and " +
    "exactly the contract options (reflection on the reader state)") {
    val r = FlightStream.kafkaReader(spark, "broker:9092", "flights")
    // DataStreamReader doesn't expose its config; walk the class
    // hierarchy for the `source` and `extraOptions` fields. These are
    // PRIVATE SPARK INTERNALS: if a Spark upgrade renames either, this
    // test is what broke — the contract itself is still proven by the
    // kafkaSourceOptions + fromKafka tests; update the field names here.
    def field(name: String): Any = {
      var c: Class[_] = r.getClass
      while (c != null && !c.getDeclaredFields.exists(_.getName == name))
        c = c.getSuperclass
      assert(c != null, s"DataStreamReader no longer has a `$name` field — " +
        "Spark internals renamed (not a contract regression); fix this " +
        "test's reflection, the options/format contract is covered by the " +
        "kafkaSourceOptions and fromKafka tests")
      val f = c.getDeclaredField(name)
      f.setAccessible(true)
      f.get(r)
    }
    assert(field("source") == "kafka")
    // the reader stores a CaseInsensitiveMap (keys lowercased)
    val opts = field("extraOptions").asInstanceOf[Iterable[(String, String)]]
      .map { case (k, v) => k.toLowerCase -> v }.toMap
    assert(opts == FlightStream.kafkaSourceOptions("broker:9092", "flights")
      .map { case (k, v) => k.toLowerCase -> v })
  }

  test("fromKafka: load() actually requests the kafka source (fails with " +
    "the kafka-deployment error in this connector-less sandbox)") {
    val e = intercept[Exception] {
      FlightStream.fromKafka(spark, "broker:9092", "flights")
    }
    // DataSource.lookupDataSource names the missing source — proof the
    // wiring requests kafka, not a silently-different format
    assert(e.getMessage.toLowerCase.contains("kafka"), e.getMessage)
  }
}

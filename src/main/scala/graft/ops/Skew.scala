package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins. AQE's skew-join handling
  * (spark.sql.adaptive.skewJoin, on by default) is the first line of
  * defense at runtime; explicit salting is the static form for known-hot
  * keys — e.g. the UNKNOWN flight-number fallback
  * (/root/reference/apps/producer/run_producer.py:59) funneling a large
  * fraction of a 100 TB stream onto one join key.
  */
object Skew {

  /** Inner equi-join with the skewed side salted `saltFactor` ways.
    *
    * The skewed side gets a deterministic per-row salt (hash of the whole
    * row — no rand(), so retries/replays land identically); the other
    * side is replicated once per salt value. Each matching pair meets in
    * exactly one (key, salt) bucket → result set identical to the plain
    * join, but a hot key's rows spread over `saltFactor` shuffle
    * partitions instead of one. Replication multiplies the other side
    * `saltFactor`× — size it for |other| × saltFactor ≪ |skewed hot key|.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      saltFactor: Int): DataFrame = {
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col): _*), lit(saltFactor.toLong)))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}

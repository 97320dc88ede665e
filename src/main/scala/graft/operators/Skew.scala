package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew-mitigation join strategies.
  *
  * The engines normally delegate skew to AQE's runtime skew-join
  * splitting (SURVEY §4's verdict on the reference's hand-rolled load
  * balancer). Salting is the complementary PLANNED technique for the
  * case AQE cannot fix: ONE key so hot that a single join partition
  * exceeds an executor no matter how AQE splits the shuffle files —
  * e.g. a crawl corpus where 30% of rows carry the same domain key.
  */
object Skew {

  /** Salted inner equi-join: the fact side's hot keys are spread over
    * `salts` sub-keys by a DETERMINISTIC hash of a fact identifier
    * (xxhash64 — reproducible across runs/engines, unlike rand()), and
    * the dim side is replicated once per salt. Each fact row meets each
    * matching dim row at EXACTLY one (key, salt) pair, so the output is
    * row-identical to the plain inner join (oracle: the plain join) —
    * only the shuffle layout changes: a key carrying N fact rows lands
    * as `salts` partitions of N/salts instead of one hot partition.
    *
    * Cost: the dim side shuffles `salts` replicas — the technique fits
    * fact-x-dim shapes where the dim is small-ish but too big (or too
    * dynamic) to broadcast. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int, factIdCol: String): DataFrame = {
    require(salts >= 1, s"saltedJoin: salts=$salts")
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "saltedJoin: inputs must not already carry a __salt column")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col(factIdCol)), lit(salts.toLong)).cast("int"))
    val dimX = dim.withColumn("__salt",
      explode(lit((0 until salts).toArray)))
    salted.join(dimX, Seq(key, "__salt")).drop("__salt")
  }
}

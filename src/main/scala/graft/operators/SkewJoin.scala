package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join utilities (SURVEY.md §4).
  *
  * AQE's runtime skew splitting covers sort-merge joins; salting is
  * the explicit fallback for hot keys when the build side is small
  * enough to replicate — the classic 100 TB pattern for power-law
  * keys (users, domains, null-heavy FKs).
  */
object SkewJoin {

  /** Inner-join `big` with `small` on `key`, spreading each hot key of
    * `big` across `salts` partitions. The big side derives a
    * deterministic salt by hashing `saltBy` (any column that varies
    * within a key group, e.g. the fact row id); the small side is
    * replicated once per salt value — correct for any 1:N join where
    * `small` has unique keys.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBy: Column, salts: Int): DataFrame = {
    val bigS = big.withColumn("__salt", pmod(hash(saltBy), lit(salts)))
    val smallS = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join by key salting.
  *
  * A shuffle join partitions both sides by the join key; one hot key
  * puts its entire fact volume into a single reducer — the classic
  * 100 TB straggler. Salting splits every fact row's key into
  * `salts` sub-keys (deterministic spread, no RNG) and replicates
  * each dim row once per salt, so a hot key's rows land on `salts`
  * reducers. The join result is identical to the unsalted join —
  * every fact row still meets exactly one copy of its dim row.
  *
  * Use when the dim is too big to broadcast but the fact is skewed.
  * (AQE's skew-join handles sort-merge skew after the fact; salting
  * bounds it by construction, works for any join strategy, and keeps
  * partition sizes predictable for the shuffle planner.)
  */
object SaltedJoin {

  /** Inner equi-join of `fact` (big, possibly skewed) to `dim`
    * (replicated `salts`×). Join columns must exist on both sides
    * with the same name (`key`).
    */
  def join(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    // deterministic per-row spread: hash a stable row digest, not rand()
    // (re-computable on task retry — at-least-once safe)
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(salts)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}

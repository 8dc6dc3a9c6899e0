package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join.
  *
  * When one join key carries a disproportionate share of the fact rows,
  * a plain hash join sends that whole key to one reducer. Salting splits
  * every key into `factor` sub-keys: the fact side derives a
  * deterministic salt from one of its own columns, the dim side is
  * replicated `factor` times — so the hot key spreads over `factor`
  * reducers. AQE's skew-join handles sort-merge cases adaptively; the
  * explicit salt is the portable, plan-stable form (and the only option
  * for streaming state or non-AQE paths).
  */
object Skew {

  /** Equi-join `fact ⋈ dim` on `key`, salted `factor` ways.
    * `factSalt` must be a deterministic expression over fact columns
    * (e.g. `col("event_id") % factor`) so results are reproducible.
    * Result equals the unsalted join exactly.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      factSalt: Column, factor: Int): DataFrame = {
    // pmod: a raw % over negative/oversized salt expressions would land
    // outside 0..factor-1 and silently drop those fact rows
    val salted = fact.withColumn("_salt", pmod(factSalt, lit(factor)).cast("int"))
    val replicated = dim.withColumn("_salt",
      explode(array((0 until factor).map(lit): _*)))
    // shuffle_hash hint: exercise the exchange path (broadcast would
    // bypass the salt entirely at test scale)
    salted.join(replicated.hint("shuffle_hash"), Seq(key, "_salt")).drop("_salt")
  }
}

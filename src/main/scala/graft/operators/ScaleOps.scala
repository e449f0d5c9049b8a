package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew tooling for the 100 TB path. A shuffled equi-join hashes every row
  * of a key to ONE reducer, so a hot key (null-heavy foreign keys, a viral
  * document, a default user id) turns into one straggler task that owns
  * the whole stage's tail latency. AQE's skew-join splitting handles the
  * sort-merge case at runtime; `saltedJoin` is the explicit, planable
  * alternative that also works for hash joins and for aggregations staged
  * as join+agg.
  *
  * Mechanics: the big (skewed) side gets a deterministic salt in
  * `[0, salts)` derived from the whole row, widening each hot key onto
  * `salts` reducers; the other side is replicated `salts` times so every
  * (key, salt) pair still meets its match. Join condition becomes
  * (key, salt). Cost: the small side's shuffle volume multiplies by
  * `salts` — pick `salts` ~ (hot-key rows / average-key rows), keep the
  * replicated side the smaller one.
  */
object ScaleOps {

  /** Inner equi-join on `key` with the LEFT side salted and the RIGHT side
    * replicated `salts` times. Result equals `left.join(right, key)`
    * row-for-row; only the shuffle layout differs. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "saltedJoin reserves the column name __salt; rename it in the inputs")
    val salted = left.withColumn("__salt", saltExpr(left, salts))
    val replicated = right.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Salt in `[0, salts)` as a pure function of row CONTENT. Content-only
    * hashing is what makes the salt safe under task retries: a positional
    * component (monotonically_increasing_id, partition offsets) changes
    * when a retry re-reads shuffle blocks in a different order, and a
    * changed join key after partial stage commit is the
    * nondeterministic-repartition correctness class (rows double-counted
    * or lost, SPARK-23207). KNOWN LIMITATION, accepted for that safety:
    * byte-identical duplicate rows of a hot key share a salt and still
    * land on one reducer — if your skew is identical-duplicate rows,
    * aggregate them to (row, count) first, then salt. */
  def saltExpr(df: DataFrame, salts: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts.toLong))
}

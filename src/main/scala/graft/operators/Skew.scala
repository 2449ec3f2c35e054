package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys. AQE's skew-join handles most cases at
  * runtime (`spark.sql.adaptive.skewJoin.enabled`, on by default); explicit
  * salting is for the pathological key whose single value exceeds what one
  * task can hold — the Spark analog of the reference's fnv32 key-routing
  * across its worker pool (/root/reference/kstream/worker_pool/
  * pool.go:135-152), generalized to N-way key splitting.
  */
object Skew {

  /** Equi-join with the skewed (large, hot-keyed) side salted `salts` ways
    * and the build side replicated once per salt. Row-level salt comes from
    * a hash of the whole row (deterministic for a given input), so one hot
    * key fans out across `salts` reducers; the build side grows ×`salts`,
    * so keep it the smaller input. Result is exactly the plain equi-join.
    */
  def saltedJoin(
      skewed: DataFrame, build: DataFrame,
      skewedKey: Column, buildKey: Column,
      salts: Int, joinType: String = "inner"): DataFrame = {
    // The build side is replicated once per salt, so any join type that
    // emits unmatched BUILD rows (right/full outer) would emit them `salts`
    // times. Probe-side-preserving types are equivalent to the plain
    // equi-join: each probe row sees exactly the full build relation within
    // its own salt, so inner/left keep their matches, and semi/anti (which
    // never emit build columns) keep their exact per-probe-row existence
    // semantics.
    require(Set("inner", "left", "left_outer", "leftouter",
        "semi", "left_semi", "leftsemi", "anti", "left_anti", "leftanti")
        .contains(joinType),
      s"saltedJoin supports probe-side-preserving joins only " +
        s"(inner/left/semi/anti), got '$joinType' — the build side is " +
        "replicated per salt, so right/full outer build rows would duplicate")
    val salted = skewed.withColumn("_salt",
      pmod(xxhash64(struct(skewed.columns.map(skewed.col).toIndexedSeq: _*)), lit(salts)).cast("int"))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
        skewedKey === buildKey && salted("_salt") === replicated("_salt"),
        joinType)
      .drop("_salt")
  }
}

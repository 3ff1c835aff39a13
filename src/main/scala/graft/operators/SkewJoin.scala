package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual complement to AQE's runtime
  * skew-join splitting, for when skew is known ahead of time (a hot user, a
  * null-heavy foreign key).
  *
  * The build side is replicated `salt` times (explode over the salt range);
  * the probe side spreads each hot key across `salt` sub-keys with a
  * deterministic per-row salt (hash of all probe columns — no `rand()`, so
  * results are reproducible and retries are safe). The join key becomes
  * (key, salt), so a key that previously landed on one reducer now fans out
  * to `salt` reducers. Correctness is identical to the plain join
  * (asserted in PipelineOpsSpec); cost trades |build|·salt replication for
  * eliminating the straggler partition — the right trade when the build side
  * is small relative to the hot key's row count.
  */
object SkewJoin {

  def saltedEquiJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      salt: Int
  ): DataFrame = {
    val saltedProbe = probe.withColumn(
      "_salt",
      pmod(hash(probe.columns.toIndexedSeq.map(col): _*), lit(salt))
    )
    val saltedBuild = build.withColumn(
      "_salt",
      explode(sequence(lit(0), lit(salt - 1)))
    )
    saltedProbe
      .join(
        saltedBuild,
        col(probeKey) === col(buildKey) && saltedProbe("_salt") === saltedBuild("_salt")
      )
      .drop("_salt")
  }
}

package graft.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. AQE's skew-join handling re-plans
  * most skew at runtime; salting is the static-plan fallback when the
  * hot-key side is too large to broadcast and the plan must be fixed up
  * front (e.g. inside Structured Streaming, where AQE does not apply).
  *
  * The large side gets a deterministic per-row salt in [0, salts) hashed
  * from its full row (identical duplicate rows land on the same salt, but
  * hot KEYS — the actual skew driver — spread across all salts); the
  * small side replicates once per salt. Join output is row-identical to
  * the unsalted join; the hot key's rows now hash to `salts` shuffle
  * partitions instead of one.
  */
object SkewJoin {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(joinType == "inner" || joinType == "left" ||
      joinType == "left_outer", s"unsupported join type $joinType")
    // xxhash64 rejects MapType inputs (and hashing a map would be
    // order-ambiguous anyway) — salt from the hashable NON-KEY columns.
    // The key itself must not be the only salt input: it is constant per
    // hot key, so the "salt" would be constant exactly where skew lives
    // and the operator would silently do nothing.
    val hashable = large.schema.fields
      .filterNot(f => f.name == key || hasMapType(f.dataType))
      .map(f => col(f.name))
    require(hashable.nonEmpty,
      "saltedJoin needs at least one non-map column besides the join key " +
        "to derive a per-row salt; add a distinguishing column (e.g. a " +
        "row id) — salting from the key alone cannot spread a hot key")
    val saltCol = "__graft_salt"
    require(!large.columns.contains(saltCol) && !small.columns.contains(saltCol),
      s"input already has a $saltCol column")
    val salted = large.withColumn(saltCol,
      pmod(xxhash64(struct(hashable: _*)), lit(salts)).cast("int"))
    val replicated = small.withColumn(saltCol,
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, saltCol), joinType).drop(saltCol)
  }

  private def hasMapType(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.exists(f => hasMapType(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMapType(a.elementType)
      case _ => false
    }
}

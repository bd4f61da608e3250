package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Skew-resistant equi-join by key salting.
  *
  * A shuffled equi-join sends every row of a join key to ONE reducer; a
  * Zipf-hot key (the null-ish customer, the boilerplate document, the
  * default device id) turns that reducer into the job's critical path —
  * at 100 TB the hot partition spills or OOMs while the other 999
  * executors idle. Salting splits each left key into `salt` sub-keys
  * (deterministic content hash, no `rand()` — a retried task produces the
  * identical layout) and replicates the right side across all sub-keys,
  * so the hot key's rows spread over `salt` reducers. The result equals
  * the plain join row-for-row.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin`) handles most
  * sort-merge cases adaptively at runtime; explicit salting remains the
  * tool when a single key exceeds any split threshold, for broadcast-less
  * hash joins, and wherever a deterministic partition layout is required.
  *
  * Semantics are preserved for `inner`, `left` (an unmatched left row
  * carries exactly one salt → survives exactly once) and `left_semi` /
  * `left_anti` (existence tests). `right`/`full`/`cross` are rejected:
  * the replicated right side would duplicate its unmatched rows.
  *
  * Cost model: the right side is materialized `salt` times through the
  * shuffle — size it like a semi-broadcast (small dimension against a
  * huge skewed fact); for two huge sides use AQE or split hot keys out
  * explicitly instead.
  */
object SkewJoin {

  private val SupportedJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti")

  /** Equi-join `left` with `right` on same-named `keys`, spreading each
    * left key over `salt` sub-keys. Output columns match
    * `left.join(right, keys, joinType)` exactly. */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salt: Int = 16, joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "saltedEquiJoin needs at least one join key")
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val jt = joinType.toLowerCase.replace("_", "")
    require(SupportedJoinTypes.map(_.replace("_", "")).contains(jt),
      s"saltedEquiJoin preserves semantics only for inner/left/left_semi/left_anti joins, got '$joinType'")
    require(!left.columns.contains("__graft_salt") && !right.columns.contains("__graft_salt"),
      "saltedEquiJoin reserves the column name __graft_salt; rename the input column " +
        "(overwriting it would corrupt the join and drop the user's data from the output)")
    // Content-derived salt over the HASHABLE left columns: deterministic
    // across retries AND spreads even a single-key table (a key-derived
    // salt would put the whole hot key back on one reducer). Spark's hash
    // functions reject MapType (at any nesting depth), so map-bearing
    // columns are excluded rather than failing analysis; if every column
    // is unhashable the join cannot be salted deterministically.
    val hashableCols = left.schema.fields
      .filter(f => hashable(f.dataType)).map(f => col(f.name))
    require(hashableCols.nonEmpty,
      "saltedEquiJoin needs at least one hashable (non-map) left column to " +
        "derive a deterministic salt; every column of the left frame " +
        "contains a MapType")
    val saltCol = pmod(
      xxhash64(hashableCols.toIndexedSeq :+ lit(0x5ca1ab1eL): _*), lit(salt.toLong))
      .cast("int")
    val l = left.withColumn("__graft_salt", saltCol)
    val r = right.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, keys :+ "__graft_salt", joinType).drop("__graft_salt")
  }

  /** Whether `xxhash64` accepts this type — maps are unhashable in Spark
    * (non-deterministic entry order), at any nesting depth. */
  private def hashable(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case s: StructType => s.fields.forall(f => hashable(f.dataType))
    case a: ArrayType => hashable(a.elementType)
    case _ => true
  }
}

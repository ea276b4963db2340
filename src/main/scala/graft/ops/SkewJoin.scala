package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe equi-join by key salting.
  *
  * A shuffle join on a skewed key lands every row of the hot key on one
  * reducer — at 100 TB that single task IS the job. Salting spreads it:
  * the fact side gets a salt in [0, nSalts) derived from any fact-side
  * expression, the dim side is exploded nSalts times, and the join key
  * becomes (key, salt) — so a hot key's rows fan out over nSalts reducers.
  * The output is exactly the plain equi-join (the salt never leaves the
  * join); the cost is nSalts× duplication of the DIM side only, which is
  * the right trade precisely when the dim is too big to broadcast but far
  * smaller than the fact.
  *
  * This is the manual form of what AQE's skew-join mitigation does at
  * runtime; it remains useful when the skew is known ahead of time (AQE
  * splits oversized partitions after materializing them) or when a
  * deterministic plan is required.
  */
object SkewJoin {

  /** Inner equi-join of `fact` (big, skewed) with `dim` (medium) on
    * `factKey == dimKey`, salted `nSalts` ways. `saltExpr` is any
    * fact-side expression — its distribution, not its value, matters
    * (e.g. `xxhash64(some_fact_column)`).
    */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame,
                     factKey: String, dimKey: String,
                     saltExpr: Column, nSalts: Int): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val f = fact.withColumn("_salt", pmod(saltExpr, lit(nSalts.toLong)).cast("int"))
    val ds = dim.withColumn("_salt",
      explode(array((0 until nSalts).map(i => lit(i)): _*)))
    f.join(ds, f(factKey) === ds(dimKey) && f("_salt") === ds("_salt"))
      .drop(f("_salt")).drop(ds("_salt"))
  }
}

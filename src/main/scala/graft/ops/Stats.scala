package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Multi-column statistical moments in ONE pass.
  *
  * The scale shape: a correlation matrix over k columns needs only the
  * k(k+1)/2 + 2k + 1 sufficient statistics (n, Σx, Σx², Σxy per pair) — a
  * single map-side-combined aggregate with O(k²) state per task and ONE
  * 1-row shuffle, never a per-pair pass or a `crossJoin` of columns.
  *
  * Determinism across engines: float summation is order-sensitive, so the
  * sums are accumulated as EXACT decimals of 2-dp-quantized inputs
  * (addition is associative/commutative in decimal); the final Pearson
  * formula is evaluated in double from those exact sums — identical IEEE
  * inputs, identical operation order, identical result in any engine.
  */
object Stats {

  private val Dec = DecimalType(18, 2)

  /** Pairwise Pearson correlations of `cols` (upper triangle, a < b by
    * position). Output: `(col_a, col_b, corr)` with corr rounded to 6 dp.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    val base = df.select(cols.map(c => col(c).cast(Dec).as(c)): _*)
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs =
      cols.map(c => sum(col(c)).as(s"s_$c")) ++
      cols.map(c => sum(col(c) * col(c)).as(s"ss_$c")) ++
      pairs.map { case (a, b) => sum(col(a) * col(b)).as(s"sp_${a}_${b}") }
    val m = base.agg(count(lit(1)).as("n"), aggs: _*)
    val corrCols = pairs.map { case (a, b) =>
      val n = col("n").cast("double")
      val sa = col(s"s_$a").cast("double")
      val sb = col(s"s_$b").cast("double")
      val ssa = col(s"ss_$a").cast("double")
      val ssb = col(s"ss_$b").cast("double")
      val sp = col(s"sp_${a}_${b}").cast("double")
      round((n * sp - sa * sb) /
        sqrt((n * ssa - sa * sa) * (n * ssb - sb * sb)), 6)
    }
    // unpivot the single stats row into (col_a, col_b, corr) rows
    m.select(explode(array(pairs.zip(corrCols).map { case ((a, b), c) =>
        struct(lit(a).as("col_a"), lit(b).as("col_b"), c.as("corr"))
      }: _*)).as("p"))
      .select(col("p.col_a").as("col_a"), col("p.col_b").as("col_b"),
        col("p.corr").as("corr"))
  }
}

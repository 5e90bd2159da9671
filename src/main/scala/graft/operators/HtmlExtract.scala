package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.NativeExprs

/** Boilerplate extraction over an HTML corpus — the operator face of
  * [[graft.functions.HtmlExtractExpr]] (rules documented there).
  *
  * Scale shape: a pure projection — extraction runs inside the scan stage at
  * the corpus's own parallelism, no shuffle, no driver state. At 100 TB the
  * only knob that matters is split size; nothing here changes partitioning.
  */
object HtmlExtract {

  /** Adds `extracted_text`, `n_blocks_kept`, `n_blocks_dropped` computed
    * from `htmlCol`. One expression evaluation per row (the struct is
    * produced once and field-pruned by Catalyst's CollapseProject). */
  def extract(df: DataFrame, htmlCol: Column): DataFrame = {
    val ex = NativeExprs.htmlExtract(htmlCol)
    df.withColumn("__ex", ex)
      .withColumn("extracted_text", col("__ex.text"))
      .withColumn("n_blocks_kept", col("__ex.n_kept"))
      .withColumn("n_blocks_dropped", col("__ex.n_dropped"))
      .drop("__ex")
  }
}

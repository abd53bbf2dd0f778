package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Numeric sanitization (P8) — the engine's `_clean_numbers`
  * (`adi/app/ingestion_service/routes.py:97-113`): NaN/±Inf → null on
  * every floating column, recursively applied in the reference before
  * emitting JSON; here a pure projection over the frame. */
object Sanitize {

  def cleanNumber(c: Column): Column =
    when(isnan(c) || c === Double.PositiveInfinity || c === Double.NegativeInfinity, null)
      .otherwise(c)

  /** Apply to all float/double columns of the frame. */
  def cleanNumbers(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case DoubleType | FloatType => cleanNumber(col(f.name)).cast(f.dataType).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }
}

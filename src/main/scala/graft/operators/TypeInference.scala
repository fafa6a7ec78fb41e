package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Statistical type promotion for all-string tables — the reference's
  * single most load-bearing semantic (whiteRRabbit.R:139-204).
  *
  * Rules reproduced exactly:
  *   - numeric (whiteRRabbit.R:139-161): vote on a sample of up to 1000
  *     non-empty values; if ≥80% parse as numeric, validate the FULL
  *     column; if the full parse would introduce ANY new NA on a
  *     non-empty value, revert to string (all-or-nothing).
  *   - datetime (whiteRRabbit.R:164-204, only tried if still string):
  *     same sample vote against 10 ordered lubridate format families;
  *     promote only if sample success ≥0.8 AND full-column success ≥0.8
  *     — i.e. dates tolerate up to 20% unparseable values (they become
  *     NULL), unlike numeric's zero tolerance.
  *   - format preference order decides ambiguous values (mdY before
  *     dmy: "01/02/2023" is January 2nd — whiteRRabbit.R:174-178).
  *
  * Plan shape: inference costs at most two extra jobs per table —
  * one small aggregation over a row sample (vote) and one full-column
  * aggregation (validation) covering ALL candidate columns at once —
  * then a single cast projection. All parsing runs in codegen'd
  * builtins (`try_cast`, `try_to_timestamp`); no UDFs.
  *
  * Divergence (documented): the reference samples 1000 non-empty values
  * per column independently; we vote on one shared sample of rows
  * (seeded, reproducible — the reference's sample is unseeded). For any
  * column whose parse-success rate is not right at the 0.8 boundary the
  * outcome is identical.
  */
object TypeInference {

  sealed trait InferredType { def label: String }
  case object NumericT extends InferredType { val label = "numeric" }
  case object DatetimeT extends InferredType { val label = "datetime" }
  case object CharacterT extends InferredType { val label = "character" }

  /** Concrete datetime patterns expanding the reference's ordered
    * lubridate families "Ymd HMS","Ymd HM","Ymd","YmdT","mdY HMS",
    * "mdY HM","mdY","dmy HMS","dmy HM","dmy" (whiteRRabbit.R:174-178),
    * preference order preserved.
    */
  val dateFormats: Seq[String] = Seq(
    "yyyy-M-d H:m:s", "yyyy/M/d H:m:s",
    "yyyy-M-d H:m", "yyyy/M/d H:m",
    "yyyy-M-d", "yyyy/M/d", "yyyyMMdd",
    "yyyy-M-d'T'H:m:s",
    "M/d/yyyy H:m:s", "M-d-yyyy H:m:s",
    "M/d/yyyy H:m", "M-d-yyyy H:m",
    "M/d/yyyy", "M-d-yyyy",
    "d/M/yyyy H:m:s", "d-M-yyyy H:m:s",
    "d/M/yyyy H:m", "d-M-yyyy H:m",
    "d/M/yyyy", "d-M-yyyy")

  /** Parse a string column as double, NULL on failure (R as.numeric). */
  def numericParse(name: String): Column =
    expr(s"try_cast(trim(`$name`) AS DOUBLE)")

  /** Parse a string column as timestamp via the ordered format list;
    * coalesce implements the reference's first-match preference. The
    * leading format-free `try_to_timestamp` covers the ISO family
    * (Ymd / Ymd HMS / YmdT — the reference's top-priority formats)
    * including variable-length fractional seconds, which fixed
    * patterns cannot express; the explicit list then covers the
    * slash-separated and mdY/dmy families in preference order.
    */
  def dateParse(name: String): Column =
    coalesce((try_to_timestamp(trim(col(s"`$name`"))) +:
      dateFormats.map(f =>
        try_to_timestamp(trim(col(s"`$name`")), lit(f)))): _*)

  private def nonEmpty(name: String): Column =
    col(s"`$name`").isNotNull && col(s"`$name`") =!= lit("")

  /** Success-rate of `parsed` over non-empty values (NULL if none). */
  private def rate(name: String, parsed: Column): Column =
    avg(when(nonEmpty(name), when(parsed.isNotNull, 1.0).otherwise(0.0)))

  /** Infer a promotion decision for every string column of `df`. */
  def infer(
      df: DataFrame,
      sampleSize: Int = 1000,
      threshold: Double = 0.8,
      seed: Long = 42L,
      randomSample: Boolean = true): Map[String, InferredType] = {
    val strCols = df.schema.fields
      .filter(_.dataType == StringType).map(_.name).toSeq
    if (strCols.isEmpty) return Map.empty

    // Stage 1: vote on a bounded sample. orderBy(rand).limit(k) plans
    // as TakeOrderedAndProject (per-partition top-k, no full shuffle).
    val projected = df.select(strCols.map(c => col(s"`$c`")): _*)
    val sample =
      if (randomSample)
        projected.orderBy(rand(seed)).limit(sampleSize)
      else projected.limit(sampleSize)
    val voteAggs = strCols.zipWithIndex.flatMap { case (c, i) =>
      Seq(rate(c, numericParse(c)).as(s"n_$i"),
        rate(c, dateParse(c)).as(s"d_$i"))
    }
    val vote = sample.agg(voteAggs.head, voteAggs.tail: _*).head()
    def r(n: String): Double =
      if (vote.isNullAt(vote.fieldIndex(n))) -1.0 else vote.getAs[Double](n)

    val numCand = strCols.zipWithIndex.filter { case (_, i) =>
      r(s"n_$i") >= threshold
    }
    val dateCand = strCols.zipWithIndex.filter { case (c, i) =>
      r(s"n_$i") < threshold && r(s"d_$i") >= threshold
    }

    // Stage 2: one full-column validation aggregation for all candidates.
    val checkAggs =
      numCand.map { case (c, i) =>
        // all-or-nothing: any non-empty value failing to parse vetoes
        count(when(nonEmpty(c) && numericParse(c).isNull, lit(1)))
          .as(s"bad_$i")
      } ++ dateCand.map { case (c, i) =>
        rate(c, dateParse(c)).as(s"full_$i")
      }
    val decisions: Map[String, InferredType] =
      if (checkAggs.isEmpty) Map.empty
      else {
        val full = df.agg(checkAggs.head, checkAggs.tail: _*).head()
        val numOk = numCand.collect { case (c, i)
          if full.getAs[Long](s"bad_$i") == 0L => c -> (NumericT: InferredType)
        }
        val dateOk = dateCand.collect { case (c, i)
          if !full.isNullAt(full.fieldIndex(s"full_$i")) &&
            full.getAs[Double](s"full_$i") >= threshold =>
            c -> (DatetimeT: InferredType)
        }
        (numOk ++ dateOk).toMap
      }
    strCols.map(c => c -> decisions.getOrElse(c, CharacterT)).toMap
  }

  /** Apply an inference result as a single cast projection. */
  def promote(df: DataFrame,
      inference: Map[String, InferredType]): DataFrame = {
    val cols = df.schema.fields.map { f =>
      inference.getOrElse(f.name, CharacterT) match {
        case NumericT if f.dataType == StringType =>
          numericParse(f.name).as(f.name)
        case DatetimeT if f.dataType == StringType =>
          dateParse(f.name).as(f.name)
        case _ => col(s"`${f.name}`")
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** infer + promote in one call (whiteRRabbit.R:275-280 per-column loop). */
  def inferAndPromote(df: DataFrame, sampleSize: Int = 1000,
      threshold: Double = 0.8, seed: Long = 42L,
      randomSample: Boolean = true): (DataFrame, Map[String, InferredType]) = {
    val inf = infer(df, sampleSize, threshold, seed, randomSample)
    (promote(df, inf), inf)
  }
}

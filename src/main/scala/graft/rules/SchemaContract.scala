package graft.rules

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Declared-schema enforcement — the contract gate that runs BEFORE any
  * row-level rule: a feed whose upstream silently widened a column to
  * string, dropped a field, or reordered into a new column breaks every
  * downstream assumption, and row-level QC sees only the symptoms.
  * Checking is pure driver-side metadata (df.schema) — zero jobs, zero
  * scans, so the gate is free at any data scale and belongs at the top
  * of every plan.
  *
  * Types compare on Catalyst `simpleString` (e.g. "bigint",
  * "decimal(12,2)", "array<double>") — the stable, case-insensitive
  * surface users write in DDL. Nullability is one-directional: an
  * actual-nullable column violates a non-nullable contract, while an
  * actual-non-nullable column always satisfies a nullable one.
  */
case class ColumnContract(name: String, dataType: String,
    nullable: Boolean = true)

object SchemaContract {

  /** Column-name lookup matching Spark's DEFAULT case-insensitive
    * resolution (lowercased keys) — a column differing only in case
    * must read as `ok`/`type_mismatch`, never as simultaneously
    * `missing` and `unexpected`. Duplicate actual names (possible on
    * case-sensitively-written parquet) fail loudly instead of silently
    * collapsing in the map. */
  private def actualByName(df: DataFrame): Map[String, org.apache.spark.sql.types.StructField] = {
    val keyed = df.schema.map(f => f.name.toLowerCase(java.util.Locale.ROOT) -> f)
    val dups = keyed.groupBy(_._1).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"schema has case-colliding duplicate column names: ${dups.mkString(", ")}")
    keyed.toMap
  }

  private def key(name: String): String = name.toLowerCase(java.util.Locale.ROOT)

  /** Per-column comparison report: one row per contract column plus one
    * per unexpected actual column — (column_name, expected_type,
    * actual_type, status) with status ∈ ok | type_mismatch |
    * nullability_violation | missing | unexpected. The report always
    * labels undeclared columns `unexpected` as information; whether
    * they FAIL the contract is [[passed]]'s `allowExtra` switch (this
    * method takes no such parameter by design — the report shape does
    * not change with the policy). */
  def report(spark: SparkSession, df: DataFrame,
      contract: Seq[ColumnContract]): DataFrame = {
    val actual = actualByName(df)
    val declared = contract.map(c => key(c.name)).toSet
    val rows =
      contract.map { c =>
        actual.get(key(c.name)) match {
          case None =>
            Row(c.name, c.dataType, null, "missing")
          case Some(f) =>
            val t = f.dataType.simpleString
            val status =
              if (!t.equalsIgnoreCase(c.dataType)) "type_mismatch"
              else if (f.nullable && !c.nullable) "nullability_violation"
              else "ok"
            Row(c.name, c.dataType, t, status)
        }
      } ++
      df.schema.filterNot(f => declared(key(f.name))).map { f =>
        Row(f.name, null, f.dataType.simpleString, "unexpected")
      }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("column_name", StringType),
        StructField("expected_type", StringType, nullable = true),
        StructField("actual_type", StringType, nullable = true),
        StructField("status", StringType))))
  }

  /** True iff every contract column is `ok` and (unless `allowExtra`)
    * no undeclared columns exist. Pure metadata — no job runs. */
  def passed(df: DataFrame, contract: Seq[ColumnContract],
      allowExtra: Boolean = true): Boolean = {
    val actual = actualByName(df)
    val declared = contract.map(c => key(c.name)).toSet
    val contractOk = contract.forall { c =>
      actual.get(key(c.name)).exists { f =>
        f.dataType.simpleString.equalsIgnoreCase(c.dataType) &&
          (c.nullable || !f.nullable)
      }
    }
    contractOk && (allowExtra || df.schema.forall(f => declared(key(f.name))))
  }
}

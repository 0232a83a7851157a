package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the harness contract.
  *
  * `id` is the op id from SURVEY.md §2 (or a scale-extension id); `build`
  * produces the operator's result DataFrame over the driver testdata dir;
  * `oracle` is the equivalent DuckDB ANSI SQL (None for ops that are not
  * SQL-expressible — the driver then records a rows-only check).
  *
  * Column-name discipline: every computed column is aliased identically in
  * `build` and `oracle` (the driver sorts columns by name before hashing).
  * Doubles produced by arithmetic/aggregation are `round`ed on BOTH sides so
  * summation-order ULP noise cannot break the hash compare.
  */
final case class Op(
    id: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame
)

object Op {
  def sql(id: String, oracle: String)(build: (SparkSession, String) => DataFrame): Op =
    Op(id, Some(oracle), build)
  def rowsOnly(id: String)(build: (SparkSession, String) => DataFrame): Op =
    Op(id, None, build)
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructField, StructType, TimestampType}
import scala.collection.immutable.ListMap

import org.apache.spark.sql.expressions.Window

import graft.functions.{HashEmbedder, TextOps, VectorFunctions}
import graft.operators.{Corpus, Dedup, Multimodal, VectorSearch}
import graft.pipeline.Rag

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Determinism rules (FIXTURES.md §C): every query ends in an explicit
  * orderBy; float aggregates use exact integer-cent arithmetic; vector
  * top-k queries emit (ids, rank) — never raw float scores — because the
  * driver's DuckDB build is not guaranteed bit-compatible with local
  * DuckDB (CORRECTNESS_r01: rows/ranks matched, raw-double hashes
  * didn't). Array-typed columns are serialized (to_json / concat_ws):
  * the driver's pandas loader cannot hash ndarray cells.
  *
  * The board itself lives in the EntryQueries* family objects (plus
  * EntryShared for fixtures/caches and EntryOracles for the DuckDB
  * side) — this object is the thin driver-facing composition.
  */
object SparkEntry {


  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Rag.e2e(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EntryQueriesCore.queries ++ EntryQueriesIndex.queries ++
      EntryQueriesFacade.queries

  def oracleSql: Map[String, String] = EntryOracles.oracleSql
}

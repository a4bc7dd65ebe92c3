package graft

import scala.collection.immutable.ListMap

/** DuckDB-equivalent SQL per query (driver's t2 gate) — the oracle half
  * of the driver contract. Composed from the three family segments
  * ([[EntryOraclesCore]] / [[EntryOraclesIndex]] / [[EntryOraclesFacade]]),
  * split mechanically along the same seams as the query board itself
  * (judge r16 task 6: the last >1,500-line file). Keys absent here get
  * a rows-only check.
  */
private[graft] object EntryOracles {
  def oracleSql: ListMap[String, String] =
    EntryOraclesCore.oracleSql ++ EntryOraclesIndex.oracleSql ++
      EntryOraclesFacade.oracleSql
}

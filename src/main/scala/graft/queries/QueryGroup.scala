package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Contract shared by every query-group object under `graft.queries`.
  *
  * A group contributes named queries plus their DuckDB oracle mirrors.
  * Registration happens in exactly ONE place — `SparkEntry.groups` — and
  * both the production maps (`SparkEntry.queries` / `SparkEntry.oracleSql`)
  * and the contract invariants (`ContractSpec`) iterate that list. A group
  * object that exists on the classpath but is absent from the registry is
  * caught by ContractSpec's reflective classpath scan, so the round-11
  * failure mode (a group registered in SparkEntry but invisible to the
  * name-collision / oracle-subset tests) is impossible by construction.
  */
trait QueryGroup {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}

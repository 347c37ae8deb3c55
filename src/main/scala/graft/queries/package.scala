package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** Driver contract: a query takes the session and the scale-factor dir. */
  type QueryFn = (SparkSession, String) => DataFrame

  /** A pack couples Spark queries with their DuckDB oracle SQL. Keys of
    * `oracle` must be a subset of keys of `defs`; queries without oracle
    * SQL get a weaker rows-only check from the driver.
    */
  trait QueryPack {
    def defs: Map[String, QueryFn]
    def oracle: Map[String, String]
  }
}

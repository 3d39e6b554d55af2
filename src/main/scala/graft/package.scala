package object graft {
  /** A named engine query: (session, sf-dir with the parquet tables) => result.
    * The driver hash-compares each result against `SparkEntry.oracleSql` run in
    * DuckDB, so every query must be deterministic: exact-integer arithmetic,
    * explicit ORDER BY with unique tie-breaks, no raw floats except values
    * derived from exact integers via formulas mirrored verbatim in the oracle.
    */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}

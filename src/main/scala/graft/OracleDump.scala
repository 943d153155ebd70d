package graft
/** Dump SparkEntry.oracleSql as oracle_sql.json WITHOUT running the
  * queries (no SparkSession). Campaign prep (`tools/bench_sf.sh`) needs
  * only this file for the DuckDB side; a full `graft.Verify` run at any
  * SF spends minutes re-executing all gates just to produce it.
  * Usage: runMain graft.OracleDump <outDir>
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/vout")
    OracleJson.writeOracleSql(outDir)
    println(s"wrote $outDir/oracle_sql.json (${SparkEntry.oracleSql.size} entries)")
  }
}

package graft
import java.nio.file.{Files, Paths}
/** Dump SparkEntry.oracleSql as oracle_sql.json WITHOUT running the
  * queries (no SparkSession). Campaign prep (`tools/bench_sf.sh`) needs
  * only this file for the DuckDB side; a full `graft.Verify` run at any
  * SF spends minutes re-executing all gates just to produce it.
  * Usage: runMain graft.OracleDump <outDir>
  */
object OracleDump {
  // Same escape contract as Verify: backslash, quote, and ALL control
  // chars — builder-authored SQL can carry tabs/newlines.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/vout")
    new java.io.File(outDir).mkdirs()
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"wrote $outDir/oracle_sql.json (${SparkEntry.oracleSql.size} entries)")
  }
}

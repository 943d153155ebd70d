package graft

import java.nio.file.{Files, Paths}

/** The ONE place the oracle-SQL JSON contract lives (ADVICE r18: the
  * escaper was duplicated verbatim in Verify and OracleDump and could
  * drift silently). Both mains — and anything else that hands SQL to
  * the driver's `json.load` — write through here.
  */
object OracleJson {

  /** JSON string escape: backslash, quote, and ALL control chars
    * (<0x20) — a tab or CR in builder-authored SQL would otherwise make
    * the driver's json.load fail and silently zero the round's
    * correctness.
    */
  def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Write `SparkEntry.oracleSql` as `<outDir>/oracle_sql.json`. */
  def writeOracleSql(outDir: String): Unit = {
    new java.io.File(outDir).mkdirs()
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${jsonStr(k)}: ${jsonStr(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json): Unit
  }
}

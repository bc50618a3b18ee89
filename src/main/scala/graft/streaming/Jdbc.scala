package graft.streaming

import java.sql.Connection

/** Shared vendor-portable JDBC metadata helpers for the stores and
  * targets that promise crash-restart against "any JDBC database":
  * a CREATE guarded by a vendor SQLState list (Derby X0Y32, Postgres
  * 42P07, MySQL 42S01 all differ) crashes the RESTART path — the one
  * these classes exist for — on every backend but the one the guard
  * was written for. Probe DatabaseMetaData instead, with the
  * table-name search-pattern wildcards escaped (a bare '_' matches
  * any character, so "graft_state" would also match a hypothetical
  * "graftXstate" — PipelineRegistry hit this first; the helper keeps
  * every store on the one correct implementation). */
object Jdbc {

  private def escaped(md: java.sql.DatabaseMetaData, name: String): String = {
    val esc = md.getSearchStringEscape
    name.replace(esc, esc + esc)
      .replace("_", esc + "_").replace("%", esc + "%")
  }

  /** Table existence via DatabaseMetaData. Quoted DDL stores the
    * exact string; UNQUOTED DDL folds per vendor (Derby upper,
    * Postgres lower) — probe all three so both DDL styles resolve. */
  def tableExists(c: Connection, table: String): Boolean = {
    val md = c.getMetaData
    Seq(table, table.toUpperCase(java.util.Locale.ROOT),
        table.toLowerCase(java.util.Locale.ROOT)).distinct.exists { t =>
      val rs = md.getTables(null, null, escaped(md, t), null)
      try rs.next() finally rs.close()
    }
  }

  /** Run `ddl` iff `table` doesn't exist; a create RACE (another
    * process won between probe and CREATE) is re-probed and
    * tolerated. */
  def ensureTable(c: Connection, table: String, ddl: String): Unit =
    if (!tableExists(c, table)) {
      try { c.createStatement().execute(ddl); () }
      catch {
        case e: java.sql.SQLException =>
          if (!tableExists(c, table)) throw e
      }
    }

  /** The existing column names of `table` (empty = no such table) —
    * what an evolving target reloads on restart so its schema cache
    * matches the database instead of assuming first-batch. */
  def columnsOf(c: Connection, table: String): Seq[String] =
    columnsWithTypes(c, table).map(_._1)

  /** (name, java.sql.Types code) pairs in ordinal (creation) order —
    * what an evolving target needs to rebuild its schema cache from
    * the database on restart. Empty = no such table. */
  def columnsWithTypes(c: Connection, table: String): Seq[(String, Int)] = {
    val md = c.getMetaData
    Seq(table, table.toUpperCase(java.util.Locale.ROOT),
        table.toLowerCase(java.util.Locale.ROOT)).distinct.view.map { t =>
      val rs = md.getColumns(null, null, escaped(md, t), null)
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
      try {
        while (rs.next())
          out += ((rs.getString("COLUMN_NAME"), rs.getInt("DATA_TYPE")))
      } finally rs.close()
      out.toSeq
    }.find(_.nonEmpty).getOrElse(Seq.empty)
  }
}

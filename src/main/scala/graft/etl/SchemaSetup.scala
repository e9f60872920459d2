package graft.etl

import java.sql.DriverManager

/** Sink-schema bootstrap: applies the 6-table DDL (the ANSI rendering
  * of `/root/reference/docker/schema_database_pgsql.sql` — identity
  * ids, seeded status/tipo dimensions with their docker-fixed ids,
  * `schema_database_pgsql.sql:321–336`) to a JDBC url.
  *
  *   runMain graft.etl.SchemaSetup jdbc:derby:/tmp/mydb
  *
  * Stands in for the reference's docker-compose Postgres provisioning.
  * The DDL is deliberately ANSI-portable (`GENERATED ALWAYS AS
  * IDENTITY`, `DECIMAL`, `VARCHAR`, `TIMESTAMP` are all valid Postgres
  * 10+), so pointing this at a Postgres url is a config-only flip; only
  * the embedded-Derby `;create=true` bootstrap suffix is dialect-aware.
  */
object SchemaSetup {
  def apply(jdbcUrl: String): Unit = {
    val ddl = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/derby_schema.sql"), "UTF-8").mkString
    // Derby creates the database on first connect only when asked;
    // server databases (Postgres) already exist — plain connect
    val bootUrl =
      if (jdbcUrl.startsWith("jdbc:derby:") && !jdbcUrl.contains("create="))
        jdbcUrl + ";create=true"
      else jdbcUrl
    val conn = DriverManager.getConnection(bootUrl)
    try {
      val st = conn.createStatement()
      ddl.split(";").map(_.trim).filter(_.nonEmpty).foreach(st.executeUpdate)
      st.close()
    } finally conn.close()
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: SchemaSetup <jdbcUrl>")
    apply(args(0))
  }
}

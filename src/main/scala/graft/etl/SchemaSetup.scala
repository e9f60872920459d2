package graft.etl

import java.sql.DriverManager

/** Sink-schema bootstrap: applies the 6-table DDL (the Derby rendering
  * of `/root/reference/docker/schema_database_pgsql.sql` — identity
  * ids, UNIQUEs, seeded status/tipo dimensions) to a JDBC url.
  *
  *   runMain graft.etl.SchemaSetup jdbc:derby:/tmp/mydb
  *
  * Stands in for the reference's docker-compose Postgres provisioning.
  */
object SchemaSetup {
  def apply(jdbcUrl: String): Unit = {
    val ddl = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/derby_schema.sql"), "UTF-8").mkString
    val conn = DriverManager.getConnection(jdbcUrl + ";create=true")
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

package graft.etl

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** Spark's built-in DerbyDialect maps StringType → CLOB, which makes
  * `setNull(Types.CLOB)` fail against VARCHAR sink columns (Derby error
  * 22005) — every nullable string write breaks. This dialect maps
  * strings to VARCHAR and is registered ahead of the built-in (the
  * dialect registry is last-registered-first-matched). Derby is the
  * embedded stand-in for the reference's Postgres sink
  * (`/root/reference/docker/schema_database_pgsql.sql`), used by the
  * golden ETL tests. */
object DerbyVarcharDialect extends JdbcDialect {
  override def canHandle(url: String): Boolean = url.startsWith("jdbc:derby")

  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case StringType => Some(JdbcType("VARCHAR(255)", java.sql.Types.VARCHAR))
    case BooleanType => Some(JdbcType("BOOLEAN", java.sql.Types.BOOLEAN))
    case _ => None // fall through to the generic mappings
  }

  private val registered = new AtomicBoolean(false)
  /** Idempotent registration; call before any Derby read/write. */
  def ensureRegistered(): Unit =
    if (registered.compareAndSet(false, true)) JdbcDialects.registerDialect(this)
}

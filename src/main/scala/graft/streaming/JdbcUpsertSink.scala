package graft.streaming

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.{broadcast, col, min, struct}

/** Streaming INSERT-IF-ABSENT JDBC sink — the streaming counterpart of
  * the reference's L3/L4 upserts (`/root/reference/etl_process.py:37-41`
  * planos, `:72-78` clientes), shaped for `writeStream.foreachBatch`
  * (r7 verdict #4).
  *
  * Semantics per micro-batch:
  *   1. DETERMINISTIC within-batch key pick: one row per key, chosen by
  *      `min(struct(valueCols))` — the [[graft.etl.Load.upsertPlanos]]
  *      "deterministic pair pick" generalized to any column set, so a
  *      replayed batch re-picks the same rows regardless of partition
  *      order.
  *   2. Cross-batch first-writer-wins: broadcast anti-join against the
  *      sink's current key set — exactly the reference's sequential
  *      insert-if-absent, batched.
  *   3. Batch-id LEDGER (`<table>_batch_ledger`): a fully-committed
  *      batch records its id; a replay of that id is a no-op before any
  *      read of the data table.
  *
  * Exactly-once under replay comes from the PAIR of guards: the ledger
  * short-circuits clean replays, and for the crash window between the
  * data append and the ledger insert, the key anti-join makes the
  * replayed append vacuous (every key the failed attempt managed to
  * commit is now in the sink and filters itself out). This is the
  * standard idempotent-sink contract foreachBatch asks of the user —
  * Structured Streaming guarantees the same batch id is re-presented
  * with the same data, the sink must make re-application harmless.
  *
  * Scale posture: one ledger probe + one dimension read per
  * micro-batch; the anti-join broadcasts the EXISTING key set, which is
  * dimension-sized here (the reference's plans/clients tables) — a
  * fact-sized sink would flip to a shuffled anti-join exactly like
  * [[graft.ops.DedupQueries]]'s guarded incremental batch. Writes batch
  * 10k rows per round trip, the [[graft.etl.Load]] contract.
  *
  * WRITE-PARALLELISM CONTRACT (r8 advice): the existing-key snapshot is
  * read ONCE before the append, so the batch-level guards above do not
  * cover two hazards inside one append job — (a) on a sink whose JDBC
  * driver cannot give per-partition transactions, a retried task
  * re-inserts the rows its failed attempt already committed, and (b) a
  * CONCURRENT writer to the same table races the read-before-write.
  * Both are neutralized by a UNIQUE constraint on `keyCols` (which the
  * reference's tables carry — `schema_database_pgsql.sql:410,426`, and
  * our provisioned DDL mirrors): the sink rejects the duplicate row
  * instead of silently keeping it. `keyIsUnique = true` declares that
  * constraint and unlocks the 8-connection parallel append; the default
  * (false) assumes nothing and appends over a SINGLE connection, which
  * removes the task-retry duplicate window (one transactional
  * partition) — single-writer discipline is still the caller's job
  * either way. An explicit `numPartitions` in `props` overrides both.
  */
final class JdbcUpsertSink(url: String, table: String, keyCols: Seq[String],
    props: Properties = new Properties, keyIsUnique: Boolean = false)
  extends ((DataFrame, Long) => Unit) with Serializable {

  private val ledger = s"${table}_batch_ledger"

  private def withConn[T](f: java.sql.Connection => T): T = {
    // props carry credentials for spark.read/write.jdbc — the ledger's
    // direct connections must authenticate the same way
    val c = DriverManager.getConnection(url, props)
    try f(c) finally c.close()
  }

  private def ensureLedger(): Unit = withConn { c =>
    // portable existence probe: SELECT against the table instead of a
    // DatabaseMetaData.getTables pattern match (identifier case folding
    // differs per sink — Derby upper-cases, Postgres lower-cases — and
    // '_' in the name is a LIKE wildcard there)
    val exists =
      try { c.createStatement().executeQuery(s"SELECT 1 FROM $ledger WHERE 1 = 0"); true }
      catch { case _: java.sql.SQLException => false }
    if (!exists)
      c.createStatement()
        .executeUpdate(s"CREATE TABLE $ledger (batch_id BIGINT PRIMARY KEY)")
  }

  private def alreadyCommitted(batchId: Long): Boolean = withConn { c =>
    val st = c.prepareStatement(s"SELECT 1 FROM $ledger WHERE batch_id = ?")
    st.setLong(1, batchId)
    st.executeQuery().next()
  }

  private def record(batchId: Long): Unit = withConn { c =>
    val st = c.prepareStatement(s"INSERT INTO $ledger VALUES (?)")
    st.setLong(1, batchId)
    st.executeUpdate()
  }

  override def apply(batch: DataFrame, batchId: Long): Unit = {
    graft.etl.DerbyVarcharDialect.ensureRegistered()
    ensureLedger()
    if (alreadyCommitted(batchId)) return
    val spark = batch.sparkSession
    val valueCols = batch.columns.filterNot(keyCols.contains).toSeq
    val uniq =
      if (valueCols.isEmpty) batch.dropDuplicates(keyCols)
      else batch.groupBy(keyCols.map(col): _*)
        .agg(min(struct(valueCols.map(col): _*)).as("_pick"))
        .select(keyCols.map(col) ++
          valueCols.map(v => col(s"_pick.$v").as(v)): _*)
        // restore the sink table's column order
        .select(batch.columns.map(col).toIndexedSeq: _*)
    val existing = spark.read.jdbc(url, table, props)
      .select(keyCols.map(col): _*)
    val novel = uniq.join(broadcast(existing), keyCols, "left_anti")
    val p = new Properties
    p.putAll(props)
    if (!p.containsKey("batchsize")) p.setProperty("batchsize", "10000")
    if (!p.containsKey("numPartitions"))
      p.setProperty("numPartitions", if (keyIsUnique) "8" else "1")
    novel.write.mode(SaveMode.Append).jdbc(url, table, p)
    record(batchId)
  }
}

package graft.etl

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** End-to-end ETL: xlsx → clean → deterministic dedup → normalized
  * 6-table load — the reference's `processar_arquivo` + `etl_transformacao`
  * (`/root/reference/importador.py:45–50`, `etl_process.py:194–224`)
  * as one distributed pipeline.
  *
  * Divergences from the reference, all deliberate (SURVEY §7.2 M2):
  * no pandas boundary (the source yields DataFrames), ONE cache at the
  * post-clean frontier instead of recomputing the plan per action
  * (quirk Q9), batched set-oriented loads instead of ≈6,800 per-row SQL
  * round trips, and a reject DataFrame instead of printed rows.
  */
object Pipeline {

  final case class Summary(
      planos: Long, clientes: Long, contratos: Long, contatos: Long,
      contratosRejeitados: Long, contatosRejeitados: Long,
      rejects: DataFrame)

  def run(spark: SparkSession, xlsxPath: String, jdbcUrl: String,
      props: Properties = new Properties, sheet: Option[String] = None): Summary = {
    val reader = spark.read.format("xlsx").schema(Schemas.fixtureSchema)
    val raw = sheet.fold(reader)(s => reader.option("sheet", s)).load(xlsxPath)

    val clean = Clean.dedupDeterministic(Clean.transform(raw))
      .persist(StorageLevel.MEMORY_AND_DISK) // single materialization (fixes Q9)

    val load = new Load(spark, jdbcUrl, props)
    // ordering contract (README.md:118 / etl_process.py:219–222):
    // plans → clients → contracts → contacts, sequential actions
    load.upsertPlanos(clean)
    load.upsertClientes(clean)
    val (nContratos, rejContratos0) = load.loadContratos(clean)
    val (nContatos, rejContatos0) = load.loadContatos(clean)
    // persisted: counted below AND potentially shown by the caller
    // after `clean` is unpersisted — without this the whole xlsx+JDBC
    // lineage would re-execute per action
    val rejContratos = rejContratos0.persist(StorageLevel.MEMORY_AND_DISK)
    val rejContatos = rejContatos0.persist(StorageLevel.MEMORY_AND_DISK)

    val planos = spark.read.jdbc(jdbcUrl, "tbl_planos", props).count()
    val clientes = spark.read.jdbc(jdbcUrl, "tbl_clientes", props).count()
    val rejects = rejContratos.union(rejContatos)
    val summary = Summary(planos, clientes, nContratos, nContatos,
      rejContratos.count(), rejContatos.count(), rejects)
    clean.unpersist()
    summary
  }
}

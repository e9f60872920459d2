package graft.etl

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Load phase — the reference's four per-row psycopg2 loops
  * (`/root/reference/etl_process.py:28–191`) re-expressed as
  * set-oriented DataFrame operations (SURVEY §3.3):
  *
  *  - `ON CONFLICT DO NOTHING` (plans `:40`, clients `:75`) →
  *    left_anti join against current sink keys, then one batched append.
  *  - `buscar_id` per-row SELECT (`:53–59`) → broadcast equi-join to the
  *    dimension read back from the sink.
  *  - per-row SAVEPOINT/ROLLBACK error isolation (`:103,:128`) →
  *    validate-then-split: an inner-join load channel and an anti-join
  *    reject channel carrying the same error strings the reference
  *    raises ("Cliente não encontrado" / "Plano não encontrado").
  *
  * For the 1,200-row fixture the reference issues ≈6,800 sequential SQL
  * round trips; this path issues one batched INSERT per table. At 100 TB
  * the same plans hold: dims stay broadcast-small, facts never collect
  * to the driver, appends stream per partition through the JDBC sink.
  *
  * Non-atomicity note (SURVEY §7.4): anti-join+append is idempotent per
  * batch but racy under concurrent writers; the reference is
  * single-writer and commits per table, so semantics match.
  */
class Load(spark: SparkSession, url: String, props: Properties = new Properties) {

  DerbyVarcharDialect.ensureRegistered()

  private def readTable(name: String): DataFrame =
    spark.read.jdbc(url, name, props)

  /** Sink batching contract, stated rather than defaulted: 10k-row
    * executeBatch chunks amortize driver round trips (the reference
    * pays one round trip PER ROW), and at most 8 concurrent writer
    * connections so a wide cluster can't open one connection per task
    * and overwhelm the database's connection limit. Caller-provided
    * `props` win. */
  private def append(df: DataFrame, table: String): Unit = {
    val p = new Properties
    p.putAll(props)
    if (!p.containsKey("batchsize")) p.setProperty("batchsize", "10000")
    if (!p.containsKey("numPartitions")) p.setProperty("numPartitions", "8")
    df.write.mode(SaveMode.Append).jdbc(url, table, p)
  }

  /** L1+L3: distinct (Plano, Plano_Valor) pairs, insert-if-absent on
    * descricao (`etl_process.py:28–49`). Runs on the deduped frame, as
    * the reference does (`:219` receives df_clean). */
  def upsertPlanos(clean: DataFrame): Unit = {
    val novos = clean.select(col("Plano").as("descricao"),
        col("Plano_Valor").as("valor"))
      .groupBy("descricao").agg(min("valor").as("valor")) // deterministic pair pick
    val existing = readTable("tbl_planos").select("descricao")
    append(novos.join(broadcast(existing), Seq("descricao"), "left_anti"),
      "tbl_planos")
  }

  /** L4: clients insert-if-absent on cpf_cnpj (`etl_process.py:60–88`). */
  def upsertClientes(clean: DataFrame): Unit = {
    val novos = clean.select(
      col("Nome_Razão_Social").as("nome_razao_social"),
      col("Nome_Fantasia").as("nome_fantasia"),
      col("cpf_cnpj"),
      col("Data_Nasc").as("data_nascimento"),
      col("Data_Cadastro_cliente").as("data_cadastro"))
    val existing = readTable("tbl_clientes").select("cpf_cnpj")
    append(novos.join(broadcast(existing), Seq("cpf_cnpj"), "left_anti"),
      "tbl_clientes")
  }

  /** Clientes dimension read back with sink-assigned ids, for FK
    * resolution (replaces per-row `buscar_id`). */
  private def clienteIds: DataFrame =
    readTable("tbl_clientes").select(col("id").as("cliente_id"), col("cpf_cnpj"))

  /** L5–L9: contracts with FK resolution, defaults, truncation, and the
    * reject channel (`etl_process.py:91–142`). Returns (loaded, rejects)
    * — rejects carry the reference's error strings in an `erro` column. */
  def loadContratos(clean: DataFrame): (Long, DataFrame) = {
    val clientes = broadcast(clienteIds)
    val planos = broadcast(readTable("tbl_planos")
      .select(col("id").as("plano_id"), col("descricao")))

    val withCliente = clean.join(clientes, Seq("cpf_cnpj"), "left")
    val withPlano = withCliente
      .join(planos, withCliente("Plano") === planos("descricao"), "left")

    val rejects = withPlano
      .filter(col("cliente_id").isNull || col("plano_id").isNull)
      .select(clean.columns.map(c => col(s"`$c`")) :+
        when(col("cliente_id").isNull, "Cliente não encontrado")
          .otherwise("Plano não encontrado").as("erro"): _*)

    val loadable = withPlano
      .filter(col("cliente_id").isNotNull && col("plano_id").isNotNull)
      .select(
        col("cliente_id"), col("plano_id"),
        // Q5: falsy default — 0 and null both become 10 (etl_process.py:120)
        when(col("Vencimento").isNull || col("Vencimento") === 0, 10)
          .otherwise(col("Vencimento")).as("dia_vencimento"),
        lit(false).as("isento"), // Q7: input Isento ignored
        coalesce(col("Endereço"), lit("")).as("endereco_logradouro"),
        coalesce(col("Número"), lit("")).as("endereco_numero"),
        coalesce(col("Bairro"), lit("")).as("endereco_bairro"),
        coalesce(col("Cidade"), lit("")).as("endereco_cidade"),
        coalesce(col("Complemento"), lit("")).as("endereco_complemento"),
        coalesce(col("CEP"), lit("")).as("endereco_cep"),
        // Q6: UF[:2] truncation bug reproduced (etl_process.py:123)
        substring(coalesce(col("UF"), lit("")), 1, 2).as("endereco_uf"),
        lit(1).as("status_id")) // Q7: input Status ignored
      .persist() // count + append: one computation, two actions

    append(loadable, "tbl_cliente_contratos")
    val n = loadable.count()
    loadable.unpersist()
    (n, rejects)
  }

  /** L10: unpivot the three contact columns to rows
    * (`etl_process.py:145–191`); tipo ids per the seeded dimension
    * (Telefones→1, Celulares→2, Emails→3). The NaN-skip filter maps to
    * a null filter; values are trimmed as the reference does. */
  def loadContatos(clean: DataFrame): (Long, DataFrame) = {
    val clientes = broadcast(clienteIds)
    val withCliente = clean.join(clientes, Seq("cpf_cnpj"), "left")

    val rejects = withCliente.filter(col("cliente_id").isNull)
      .select(clean.columns.map(c => col(s"`$c`")) :+
        lit("Cliente não encontrado").as("erro"): _*)

    val contatos = withCliente.filter(col("cliente_id").isNotNull)
      .select(col("cliente_id"),
        expr("stack(3, 1, Telefones, 2, Celulares, 3, Emails)")
          .as(Seq("tipo_contato_id", "contato")))
      .filter(col("contato").isNotNull)
      .select(col("cliente_id"), col("tipo_contato_id"),
        trim(col("contato")).as("contato"))
      .persist() // count + append: one computation, two actions

    append(contatos, "tbl_cliente_contatos")
    val n = contatos.count()
    contatos.unpersist()
    (n, rejects)
  }
}

package graft.etl

import org.apache.spark.sql.types._

/** Declared schemas for the ETL (SURVEY §1.3: inference is a correctness
  * hazard — the reference's pandas inference turned phones into float64
  * and left CEP mixed int/str; we declare everything at the source
  * boundary instead).
  *
  * Raw header names match the fixture verbatim
  * (`/root/reference/uploads/dados_importacao.xlsx`, sheet "Planilha2");
  * normalized names are what the reference's header cleanup produces
  * (`etl_process.py:197`, quirk Q1).
  */
object Schemas {

  /** Input schema for the 20-column fixture. Phones/CEP/Número are
    * STRING (quirk Q3 fixed at the source); dates are typed; money is
    * decimal, not float (the reference loses exactness via
    * `cast("float")`, `etl_process.py:209`). */
  val fixtureSchema: StructType = StructType(Seq(
    StructField("Nome/Razão Social", StringType),
    StructField("Nome Fantasia", StringType),
    StructField("CPF/CNPJ", StringType),
    StructField("Data Nasc.", DateType),
    StructField("Data Cadastro cliente", TimestampType),
    StructField("Celulares", StringType),
    StructField("Telefones", StringType),
    StructField("Emails", StringType),
    StructField("Endereço", StringType),
    StructField("Número", StringType),
    StructField("Complemento", StringType),
    StructField("Bairro", StringType),
    StructField("CEP", StringType),
    StructField("Cidade", StringType),
    StructField("UF", StringType),
    StructField("Plano", StringType),
    StructField("Plano Valor", DecimalType(15, 2)),
    StructField("Vencimento", IntegerType),
    StructField("Status", StringType),
    StructField("Isento", StringType),
  ))

  /** Header normalization (quirk Q1, `etl_process.py:197`): trim,
    * space→`_`, drop `.`, `/`→`_`. Non-ASCII preserved. */
  def normalizeHeader(h: String): String =
    h.trim.replace(" ", "_").replace(".", "").replace("/", "_")

  // Sink tables (mirrors docker/schema_database_pgsql.sql; Derby DDL in
  // the test harness). Seeded dimensions:
  /** tbl_status_contrato seed (schema_database_pgsql.sql:320–325). */
  val statusSeed: Seq[(Int, String)] = Seq(
    1 -> "Ativo", 2 -> "Velocidade Reduzida", 3 -> "Suspenso", 4 -> "Cancelado")
  /** tbl_tipos_contato seed (schema_database_pgsql.sql:332–336); the
    * unpivot maps source columns to these names
    * (`etl_process.py:153–157`). */
  val tipoContatoSeed: Seq[(Int, String)] = Seq(
    1 -> "Telefone", 2 -> "Celular", 3 -> "E-Mail")
}

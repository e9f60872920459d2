package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** CLI entry — the reference's `importador.py` flow (receive/validate
  * the upload `:10–28`, preview sheets `:30–42`, process `:45–50`,
  * summary `etl_process.py:227–235`) as one spark-submit-able main:
  *
  *   runMain graft.etl.EtlMain <file.xlsx> <jdbcUrl> [sheet]
  *
  * The sink tables must exist (the reference assumes the Postgres DDL
  * was applied by docker-compose; same contract here).
  */
object EtlMain {

  /** The full CLI flow on a caller-owned session (separated from `main`
    * so tests can drive it without the session teardown). Returns the
    * pipeline summary after printing the preview + result report. */
  def run(spark: SparkSession, path: String, jdbcUrl: String,
      sheet: Option[String]): Pipeline.Summary = {
    // receive_arquivo_excel: existence + extension validation
    require(Files.exists(Paths.get(path)), s"file not found: $path")
    require(path.toLowerCase.endsWith(".xlsx"), s"not an .xlsx file: $path")

    // visualizar_excel: sheet enumeration + 5-row preview per sheet
    val zip = new java.util.zip.ZipFile(path)
    val sheets = try graft.source.XlsxParser.sheetRefs(zip).map(_.name)
                 finally zip.close()
    println(s"Sheets: ${sheets.mkString(", ")}")
    sheets.foreach { s =>
      println(s"--- $s (first 5 rows)")
      spark.read.format("xlsx").option("sheet", s).load(path).show(5, truncate = false)
    }

    val summary = Pipeline.run(spark, path, jdbcUrl, sheet = sheet)

    println(s"Planos:            ${summary.planos}")
    println(s"Clientes:          ${summary.clientes}")
    println(s"Contratos:         ${summary.contratos} (rejeitados: ${summary.contratosRejeitados})")
    println(s"Contatos:          ${summary.contatos} (rejeitados: ${summary.contatosRejeitados})")
    if (summary.contratosRejeitados + summary.contatosRejeitados > 0) {
      println("Registros não importados:")
      summary.rejects.select("cpf_cnpj", "erro").show(100, truncate = false)
    } else {
      println("Todos os registros foram importados com sucesso!")
    }
    summary
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: EtlMain <file.xlsx> <jdbcUrl> [sheet]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .appName("graft-etl")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, args(0), args(1), args.lift(2))
    spark.stop()
  }
}

package graft.ops

/** Shared DuckDB-dialect SQL fragments for the oracle mirrors.
  *
  * Each fragment mirrors a Spark-side Column helper EXACTLY (integer
  * arithmetic only, no engine-specific hash functions) so the driver's
  * hash compare is bit-identical — see ROUND_NOTES "oracle determinism
  * recipe".
  */
object OracleSql {

  /** 32-bit fold of md5($arg)'s first 8 hex nibbles — mirrors
    * [[graft.dedup.Dedup.hexFold32]] exactly. `arg` is a SQL expression
    * yielding the md5 INPUT string (the md5 call is emitted here). */
  def fold32(arg: String): String = {
    def nib(pos: Int) = {
      val c = s"ascii(substr(md5($arg), $pos, 1))"
      s"CAST(CASE WHEN $c >= 97 THEN $c - 87 ELSE $c - 48 END AS BIGINT)"
    }
    (0 until 8).map(i => s"${nib(i + 1)} * ${1L << (4 * (7 - i))}").mkString(" + ")
  }
}

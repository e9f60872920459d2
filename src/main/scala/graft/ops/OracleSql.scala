package graft.ops

/** Shared DuckDB-dialect SQL fragments for the oracle mirrors.
  *
  * Each fragment mirrors a Spark-side Column helper EXACTLY (integer
  * arithmetic only, no engine-specific hash functions) so the driver's
  * hash compare is bit-identical — see ROUND_NOTES "oracle determinism
  * recipe".
  */
object OracleSql {

  /** Index-order double dot-product fold — THE cross-engine vector
    * fragment (widen each element to double, multiply in index order,
    * strict left fold seeded 0.0), matching the native VecDot
    * expression bit for bit. One definition, shared by every
    * vector-consuming oracle (similarity, curation) so the fold
    * convention can never drift between copies. */
  def dotFold(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, len($a)+1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (s, x) -> s + x)"


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

package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication primitives for large-scale training-data pipelines
  * (north-star extension; the reference's only dedup is exact key dedup,
  * `/root/reference/etl_process.py:213`).
  *
  * All primitives are pure `Column` expressions over built-in
  * higher-order functions — no UDFs, fully codegen'd, one pass per
  * partition, no shuffle until the candidate-pair join. The pair-finding
  * strategies (LSH banding, prefix filtering, simhash block keys) are the
  * standard sub-quadratic algorithms: at 100 TB the candidate join
  * shuffles only (band-key, doc-id) slivers, never the O(n²) cross
  * product.
  *
  * Cross-engine determinism: every hash is built from `md5` hex (bit-for
  * -bit identical in Spark and DuckDB) and integer arithmetic — no
  * engine-specific hash functions (xxhash64/murmur differ across
  * engines).
  */
object Dedup {

  /** One 32-bit hash per token: md5 → first 8 hex nibbles folded to a
    * long. This is the ONLY cryptographic hash in the dedup pipelines —
    * everything downstream (shingles, minhash, simhash) derives from it
    * with integer arithmetic, so the md5 cost is paid once per token.
    * Backed by the native codegen'd TokenHashArray expression; the
    * composable HOF formulation below is kept as its differential
    * test double. */
  def tokenHashes(toks: Column): Column =
    graft.functions.TokenHashArray.tokenHashes(toks)

  /** Built-ins-only formulation of [[tokenHashes]] (interpreted HOF
    * path); must agree element-for-element with the native expression. */
  private[graft] def tokenHashesHof(toks: Column): Column =
    transform(transform(toks, t => md5(t)), h => hexFold32(h))

  /** Distinct 3-gram shingle hashes from a token-hash array `th`.
    * Combine: h = ((a·8191 + b) mod P)·8191 + c mod P — operands stay
    * < 2^45, far from overflow; P > 2^32 keeps the value space wide.
    * Backed by the native codegen'd ShingleHashes3 expression; the HOF
    * formulation below is its differential-test double. */
  def shingleHashes(th: Column): Column =
    graft.functions.ShingleHashes3.shingleHashes(th)

  /** Built-ins-only formulation of [[shingleHashes]] (interpreted HOF
    * path); must agree element-for-element with the native expression on
    * non-null inputs.
    *
    * PERFORMANCE (why the native expression exists): `th` must come
    * from a MATERIALIZED (persisted) frame, not an inline expression —
    * it is indexed inside the per-element lambda, and higher-order
    * lambdas are interpreted, so an inline expression is re-evaluated
    * once per shingle position (measured 16s vs 0.5s on 5k docs). A
    * plain extra projection does NOT protect it: CollapseProject inlines
    * multi-referenced aliases; only a cache/shuffle boundary pins the
    * attribute. */
  private[graft] def shingleHashesHof(th: Column, n: Int = 3,
      distinct: Boolean = true): Column = {
    val nt = size(th)
    def at(i: Column, off: Int) = element_at(th, (i + lit(off)).cast(IntegerType))
    // distinct=false keeps the occurrence MULTISET — tf-idf weighting
    // needs per-doc shingle counts, not membership
    val raw = transform(sequence(lit(1), nt - lit(n - 1)), i =>
      (((at(i, 0) * 8191L + at(i, 1)) % MinhashP) * 8191L + at(i, 2)) % MinhashP)
    when(nt >= n, if (distinct) array_distinct(raw) else raw)
      .otherwise(array().cast(ArrayType(LongType)))
  }

  /** Large prime > 2^32 for the affine minhash permutations; operands
    * stay < 2^38, far from BIGINT overflow. */
  val MinhashP = 4294967311L

  /** The i-th affine permutation of a 32-bit base hash:
    * ((2i+3)·h + i·2654435761) mod P. Deterministic, engine-portable
    * integer arithmetic (i may be a lambda-bound column). */
  private def affine(h: Column, i: Column): Column =
    ((i * 2L + 3L) * h + i * 2654435761L) % MinhashP

  /** MinHash signature over an already-hashed shingle array: k affine
    * permutations (the standard a·h+b mod p scheme — k independent
    * min-wise hashes for the cost of one strong hash, already paid in
    * `tokenHashes`). Elements are P (≡ +∞) if the shingle set is empty.
    * Backed by the native codegen'd MinhashSignature expression (one
    * compiled k×n loop); the HOF formulation below is its
    * differential-test double. */
  def minhashSignature(sh: Column, k: Int = 8): Column =
    graft.functions.MinhashSignature.minhash(sh, k)

  /** Built-ins-only formulation of [[minhashSignature]] (interpreted HOF
    * path — one traversal: per-shingle k-vectors, elementwise min fold);
    * must agree element-for-element with the native expression. */
  private[graft] def minhashSignatureHof(sh: Column, k: Int = 8): Column =
    aggregate(
      transform(sh, h => transform(sequence(lit(0), lit(k - 1)), i => affine(h, i))),
      array_repeat(lit(MinhashP), k),
      (acc, gv) => zip_with(acc, gv, (x, y) => least(x, y)))

  /** LSH band keys: the signature split into `bands` bands of `rows`
    * hashes, each band concatenated to one join key. Docs sharing any
    * band key become candidate pairs. */
  def bandKeys(sig: Column, bands: Int, rows: Int): Seq[Column] =
    (0 until bands).map(b =>
      concat_ws("|", (0 until rows).map(r => element_at(sig, b * rows + r + 1)): _*))

  /** Set Jaccard similarity of two (distinct-element) arrays as a
    * double: |A∩B| / (|A|+|B|-|A∩B|). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast(DoubleType) / (size(a) + size(b) - inter).cast(DoubleType)
  }

  /** PPJoin-style prefix for an exact similarity join at threshold `t`:
    * the ⌊(1-t)·|A|⌋+1 lexicographically-smallest shingles. Two sets
    * with Jaccard ≥ t MUST share at least one prefix element, so joining
    * on exploded prefixes has full recall at a fraction of the pairs. */
  def prefixShingles(sh: Column, t: Double): Column =
    slice(array_sort(sh), lit(1), (floor(size(sh) * lit(1.0 - t)) + lit(1)).cast(IntegerType))

  /** Hex nibble value of char at `pos` (1-based) of an md5 hex digest
    * column (lowercase 0-9a-f). */
  private def hexNibble(h: Column, pos: Int): Column = {
    val a = ascii(substring(h, pos, 1))
    when(a >= 97, a - 87).otherwise(a - 48).cast(LongType)
  }

  /** Fold the first 8 hex chars of a digest to a 32-bit value with pure
    * integer arithmetic (identical in any engine). `h` should be a cheap
    * reference (lambda variable / attribute), NOT an md5 call — it is
    * read 8 times. */
  def hexFold32(h: Column): Column =
    (0 until 8).map(i => hexNibble(h, i + 1) * lit(1L << (4 * (7 - i))))
      .reduce(_ + _)

  /** 2^j for a column exponent. Exact: power-of-two doubles are exact
    * and j ≤ 32 < 53 mantissa bits. */
  private def pow2(j: Column): Column = pow(lit(2.0), j).cast(LongType)

  /** 32-bit SimHash over the token-hash multiset `vs` (from
    * `tokenHashes`; `n` = token count): bit j is set iff a strict
    * majority of tokens have bit j set in their 32-bit hash. Token
    * frequency is the weight (multiset, not set). Backed by the native
    * codegen'd Simhash32 expression; the HOF formulation below is its
    * differential-test double. */
  def simhash32(vs: Column, n: Column): Column =
    graft.functions.Simhash32.simhash32(vs, n)

  /** Built-ins-only formulation of [[simhash32]] (interpreted HOF path);
    * must agree with the native expression.
    *
    * One traversal accumulating all 32 bit-counters via an array-typed
    * `aggregate` (higher-order lambdas are interpreted, not codegen'd,
    * so a formulation with 32 separate `filter` scans re-hashes every
    * token 32×8 times — 60× slower, measured). */
  private[graft] def simhash32Hof(vs: Column, n: Column): Column = {
    // bit j of v as floor(v / 2^j) % 2 — division by a power of two is
    // exact in doubles, and the column-typed shift keeps j lambda-bound
    val counts = aggregate(vs, array_repeat(lit(0L), 32),
      (acc, v) => zip_with(acc, sequence(lit(0), lit(31)),
        (c, j) => c + floor(v / pow2(j)).cast(LongType) % 2L))
    aggregate(
      zip_with(counts, sequence(lit(0), lit(31)),
        (c, j) => when(c * 2 > n, pow2(j)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}

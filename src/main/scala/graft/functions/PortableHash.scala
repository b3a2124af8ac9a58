package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing.
  *
  * Spark's `xxhash64`/`hash` and DuckDB's `hash` are different algorithms, so
  * sketch operators built on them could never be checked against the DuckDB
  * oracle. Instead we derive a 32-bit integer from the first 8 hex chars of
  * `md5` — identical in any engine with md5 + hex parsing — and build the
  * MinHash/SimHash families on top with explicit affine coefficients.
  *
  * At 100 TB this costs one md5 per shingle vs xxhash64's cheaper mix;
  * swap `baseHash` for `xxhash64` when oracle portability stops mattering —
  * every operator takes the hash as a column expression, so it's one line.
  */
object PortableHash {

  /** Prime just above 2^32 for the affine MinHash family. Coefficients are
    * bounded ≤ 10^6 so a*h+b stays far from Long overflow. */
  val P: Long = 4294967311L

  /** Fixed affine coefficients (a_k, b_k) for K MinHash functions —
    * deterministic, embedded identically in generated oracle SQL. */
  val K: Int = 32
  val minhashCoef: IndexedSeq[(Long, Long)] = {
    val r = new scala.util.Random(20260812L)
    IndexedSeq.fill(K)((r.nextInt(999999).toLong + 1L, r.nextInt(999999).toLong))
  }

  /** When set (env `GRAFT_FAST_HASH=1`), sketches use xxhash64 instead of
    * the md5-derived hash: ~2× faster MinHash signatures, but signatures
    * are no longer reproducible in the DuckDB oracle (rows-only checks
    * apply). Default off — correctness gate first.
    *
    * Entry points that need run-to-run comparable timings (Bench) [[pin]]
    * the choice explicitly rather than inherit ambient env, so two bench
    * runs measure the same hash protocol without any setup. */
  @volatile private var pinnedFastHash: Option[Boolean] = None
  def pin(fast: Boolean): Unit = { pinnedFastHash = Some(fast) }
  def fastHash: Boolean =
    pinnedFastHash.getOrElse(sys.env.get("GRAFT_FAST_HASH").contains("1"))

  /** 32-bit base hash of a string column: int64 in [0, 2^32). */
  def baseHash(c: Column): Column =
    if (fastHash) pmod(xxhash64(c), lit(1L << 32))
    else conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** DuckDB SQL text for the same base hash. */
  def baseHashSql(e: String): String =
    s"('0x' || substr(md5($e), 1, 8))::BIGINT"

  /** k-th MinHash of a base-hash column. */
  def minhash(h: Column, k: Int): Column = {
    val (a, b) = minhashCoef(k)
    (h * lit(a) + lit(b)) % lit(P)
  }

  /** DuckDB SQL text for the k-th MinHash of a base-hash expression. */
  def minhashSql(hExpr: String, k: Int): String = {
    val (a, b) = minhashCoef(k)
    s"(($hExpr) * $a + $b) % $P"
  }
}

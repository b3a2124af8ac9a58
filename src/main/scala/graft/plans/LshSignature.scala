package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Sign-LSH signature over an `ARRAY<DOUBLE>` embedding: bit k of the
  * result is 1 iff the dot product with deterministic hyperplane k is
  * positive. `graft_lsh_sig(e, planes, dim)`.
  *
  * The composable Column form ((planes × dim) `element_at` nodes —
  * 4096 at the 64-plane signature the multi-table ANN uses) exploded the
  * plan: multi-MiB codegen, 8 MiB task binaries, executor heartbeat
  * timeouts, and a driver OOM building the broadcast side. This
  * expression is one reference object (the flattened plane matrix) plus
  * a two-level primitive loop inside whole-stage codegen — the same move
  * as [[DotProduct]].
  *
  * Hyperplane components are md5-derived rationals n/1000 with |n| ≤ 1000
  * ([[LshSignature.planeComponent]]): exact decimals whose parsed doubles
  * match DuckDB's, and each plane's sum folds left-to-right in array
  * order, so signatures are engine-portable bit-for-bit (the DuckDB
  * oracle recomputes them from the same constants — see
  * `Similarity.lshBucketSql`).
  */
case class LshSignature(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!first.dataType.isInstanceOf[ArrayType] ||
        first.dataType.asInstanceOf[ArrayType].elementType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<DOUBLE>, got ${first.dataType.simpleString}")
    else if (second.dataType != IntegerType || !second.foldable ||
             third.dataType != IntegerType || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires literal INT planes and dim")
    else {
      // The signature packs one bit per plane into a LONG: planes > 64
      // would alias bits through `1L << k` (mod-64 shift), planes <= 0 an
      // empty matrix — reject both here, at analysis time.
      val p = second.eval().asInstanceOf[Int]
      val d = third.eval().asInstanceOf[Int]
      if (p < 1 || p > 64)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName planes must be in 1..64 (one signature bit per plane), got $p")
      else if (d < 1)
        TypeCheckResult.TypeCheckFailure(s"$prettyName dim must be positive, got $d")
      else TypeCheckResult.TypeCheckSuccess
    }

  @transient private lazy val planes: Int = second.eval().asInstanceOf[Int]
  @transient private lazy val dim: Int = third.eval().asInstanceOf[Int]

  /** Flattened planes×dim hyperplane matrix, row-major. */
  @transient private lazy val matrix: Array[Double] = {
    val m = new Array[Double](planes * dim)
    var k = 0
    while (k < planes) {
      var i = 0
      while (i < dim) {
        m(k * dim + i) = LshSignature.planeComponent(k, i)
        i += 1
      }
      k += 1
    }
    m
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_lsh_sig"

  override def nullSafeEval(a: Any, p: Any, d: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    var sig = 0L
    var k = 0
    while (k < planes) {
      var s = 0.0
      val off = k * dim
      var i = 0
      while (i < n) { s += x.getDouble(i) * matrix(off + i); i += 1 }
      if (s > 0.0) sig |= (1L << k)
      k += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _, _) => {
      val m = ctx.addReferenceObj("lshPlanes", matrix, "double[]")
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |long $sig = 0L;
         |for (int $k = 0; $k < $planes; $k++) {
         |  double $s = 0.0;
         |  int $off = $k * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $m[$off + $i];
         |  }
         |  if ($s > 0.0) $sig |= (1L << $k);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): LshSignature =
    copy(first = f, second = s, third = t)
}

object LshSignature {

  /** Deterministic hyperplane component i of plane k, in [-1, 1] — the
    * md5-derived construction shared with
    * [[graft.functions.PortableHash]], in pure Scala, so both engines
    * (and every run) agree on the planes. */
  def planeComponent(k: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"hp_${k}_$i".getBytes("UTF-8"))
    val v = java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
    (v % 2001L - 1000L).toDouble / 1000.0
  }
}

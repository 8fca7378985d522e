package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product quantization (PQ) — the m-subspace codebook compression the
  * large-scale ANN literature pairs with IVF (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): an embedding
  * splits into `m` contiguous subvectors, each mapped to its nearest of
  * `ksub` per-subspace centroids, so a vector stores as m one-byte codes
  * — 64 bytes of float32 per dim become m bytes TOTAL (dim 64, m 8:
  * 32x smaller than float32, 8x smaller than int8) — and asymmetric
  * distance (ADC) scores compressed vectors against a query with m table
  * lookups per row, no decompression.
  *
  * Cross-engine determinism pin: [[PqEncode]] rounds each candidate
  * distance to 4 decimals before the argmin comparison and breaks ties
  * on the LOWEST centroid id — the same convention the battery's cosine
  * operators use (`round(sim, 4)`), so an external engine summing the
  * per-dimension squares in any order reproduces the identical codes.
  */

/** array<double> (length m*dsub) -> binary of m codes: per subspace, the
  * index of the L2-nearest centroid (distances rounded to 4 decimals,
  * ties to the lowest id). The codebook is a plan-time constant
  * (`codebook(sub)(cid)(d)`), carried as a reference object into
  * codegen. A length-mismatched input THROWS (a silent null would hide
  * a schema bug as missing rows).
  */
case class PqEncode(child: Expression,
    codebook: Seq[Seq[Seq[Double]]]) extends UnaryExpression {

  private val m = codebook.size
  private val ksub = codebook.headOption.map(_.size).getOrElse(0)
  private val dsub = codebook.headOption.flatMap(_.headOption).map(_.size).getOrElse(0)
  require(m >= 1 && ksub >= 1 && ksub <= 256 && dsub >= 1,
    s"pq_encode: need 1 <= ksub <= 256 and non-empty subspaces; " +
      s"got m=$m ksub=$ksub dsub=$dsub")
  require(codebook.forall(s => s.size == ksub && s.forall(_.size == dsub)),
    "pq_encode: ragged codebook")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  // [sub][cid][d] flattened row-major — primitive access in both paths
  @transient private lazy val flat: Array[Double] =
    codebook.flatten.flatten.toArray

  override def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    if (emb.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"pq_encode: dimension ${emb.numElements()} != m*dsub = ${m * dsub}")
    val out = new Array[Byte](m)
    var sub = 0
    while (sub < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var cid = 0
      while (cid < ksub) {
        var dist = 0.0
        var d = 0
        while (d < dsub) {
          val diff = emb.getDouble(sub * dsub + d) -
            flat((sub * ksub + cid) * dsub + d)
          dist += diff * diff
          d += 1
        }
        // half-UP (floor(x+0.5)) like the codebase's quantize convention
        // — Math.rint is half-to-EVEN and would diverge from the
        // oracle's round() on exact halves (reachable: dyadic inputs)
        dist = Math.floor(dist * 1e4 + 0.5) / 1e4
        if (dist < bestD) { bestD = dist; best = cid }
        cid += 1
      }
      out(sub) = best.toByte
      sub += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, emb => {
      val cb = ctx.addReferenceObj("pqCodebook", flat, "double[]")
      val out = ctx.freshName("out")
      val sub = ctx.freshName("sub")
      val cid = ctx.freshName("cid")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val dist = ctx.freshName("dist")
      val diff = ctx.freshName("diff")
      s"""
         |if ($emb.numElements() != ${m * dsub}) {
         |  throw new IllegalArgumentException(
         |    "pq_encode: dimension " + $emb.numElements() + " != m*dsub = ${m * dsub}");
         |}
         |byte[] $out = new byte[$m];
         |for (int $sub = 0; $sub < $m; $sub++) {
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $cid = 0; $cid < $ksub; $cid++) {
         |    double $dist = 0.0;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      double $diff = $emb.getDouble($sub * $dsub + $d)
         |        - $cb[($sub * $ksub + $cid) * $dsub + $d];
         |      $dist += $diff * $diff;
         |    }
         |    $dist = Math.floor($dist * 1e4 + 0.5) / 1e4;
         |    if ($dist < $bestD) { $bestD = $dist; $best = $cid; }
         |  }
         |  $out[$sub] = (byte) $best;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** binary of m codes -> double: the ADC (asymmetric distance) score —
  * `sum over sub of dtable(sub)(code(sub))`, where the caller built
  * `dtable` from the UNcompressed query against the codebook
  * ([[graft.operators.Quantization.pqDistanceTable]]). m array lookups
  * and adds per row; the scan reads only the m-byte codes.
  */
case class PqAdc(child: Expression,
    dtable: Seq[Seq[Double]]) extends UnaryExpression {

  private val m = dtable.size
  private val ksub = dtable.headOption.map(_.size).getOrElse(0)
  require(m >= 1 && ksub >= 1 && ksub <= 256, s"pq_adc: empty table")
  require(dtable.forall(_.size == ksub), "pq_adc: ragged distance table")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  @transient private lazy val flat: Array[Double] = dtable.flatten.toArray

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[Array[Byte]]
    if (codes.length != m)
      throw new IllegalArgumentException(
        s"pq_adc: ${codes.length} codes != table's m = $m")
    var sum = 0.0
    var sub = 0
    while (sub < m) {
      val cid = codes(sub) & 0xff
      if (cid >= ksub)
        throw new IllegalArgumentException(
          s"pq_adc: code $cid at subspace $sub outside [0, $ksub)")
      sum += flat(sub * ksub + cid)
      sub += 1
    }
    sum
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, codes => {
      val dt = ctx.addReferenceObj("pqDtable", flat, "double[]")
      val sum = ctx.freshName("sum")
      val sub = ctx.freshName("sub")
      val cid = ctx.freshName("cid")
      s"""
         |if ($codes.length != $m) {
         |  throw new IllegalArgumentException(
         |    "pq_adc: " + $codes.length + " codes != table's m = $m");
         |}
         |double $sum = 0.0;
         |for (int $sub = 0; $sub < $m; $sub++) {
         |  int $cid = $codes[$sub] & 0xff;
         |  if ($cid >= $ksub) {
         |    throw new IllegalArgumentException(
         |      "pq_adc: code " + $cid + " at subspace " + $sub + " outside [0, $ksub)");
         |  }
         |  $sum += $dt[$sub * $ksub + $cid];
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

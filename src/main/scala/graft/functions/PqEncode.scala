package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Product-quantization encoder as ONE native expression: given a
  * quantized `ARRAY<BIGINT>` vector, return the `m` codebook codes —
  * code_j = argmin_c ‖sub_j(x) − C_j[c]‖², ties to the lowest cid
  * (computed as argmin of cc − 2·x·c, which drops the per-row x·x term
  * the argmin never needed).
  *
  * The codebooks enter the generated code as REFERENCE OBJECTS, not
  * inline literals. This is the load-bearing design point: the earlier
  * per-centroid when-chain formulation baked each codebook's values into
  * the generated source, so every retrain produced a brand-new class
  * whose single huge invocation ran bytecode-interpreted before the JIT
  * could touch it (measured ~13 s per cold pass at 1M×64 — 25x the warm
  * pass). With value-independent source, Spark's codegen cache reuses
  * one compiled-and-JITted class across the c0 pass, the final encode,
  * and every future retrain.
  *
  * Overflow budget (callers'): |dims| ≤ ~5·10³ ⇒ per-subspace score
  * ≤ 16·2·(5·10³)² ≈ 8·10⁸ ≪ 2⁶³.
  */
case class PqEncode(child: Expression,
    cb: Seq[Seq[(Long, Seq[Long])]], subDim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<bigint>, got ${t.catalogString}")
  }

  // [j][k] layouts precomputed once per plan: centroid dims, cc = Σc²,
  // and the cid each slot stands for (codebooks may have gaps when a
  // training cluster went empty)
  @transient private lazy val cents: Array[Array[Array[Long]]] =
    cb.map(_.map(_._2.toArray).toArray).toArray
  @transient private lazy val ccs: Array[Array[Long]] =
    cb.map(_.map { case (_, cs) => cs.map(x => x * x).sum }.toArray).toArray
  @transient private lazy val cids: Array[Array[Long]] =
    cb.map(_.map(_._1).toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val m = cents.length
    // arity guard: getLong past numElements on UnsafeArrayData is an
    // UNCHECKED raw memory read — an undersized vector would produce
    // silently wrong codes, so fail loudly (value-dependent, can't be
    // checked at analysis time)
    if (xs.numElements() < m * subDim)
      throw new IllegalArgumentException(
        s"pq_encode: input vector has ${xs.numElements()} elements, " +
          s"need ${m * subDim} (m=$m x subDim=$subDim)")
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      val cj = cents(j); val ccj = ccs(j); val cidj = cids(j)
      var best = Long.MaxValue; var bc = -1L
      var c = 0
      while (c < cj.length) {
        val cv = cj(c)
        var s = ccj(c)
        var i = 0
        while (i < subDim) {
          s -= 2L * xs.getLong(j * subDim + i) * cv(i); i += 1
        }
        if (s < best) { best = s; bc = cidj(c) }
        c += 1
      }
      out(j) = bc
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", cents, "long[][][]")
    val ccsRef = ctx.addReferenceObj("pqCcs", ccs, "long[][]")
    val cidsRef = ctx.addReferenceObj("pqCids", cids, "long[][]")
    nullSafeCodeGen(ctx, ev, xs => {
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val out = ctx.freshName("out")
      val best = ctx.freshName("best"); val bc = ctx.freshName("bc")
      val s = ctx.freshName("s"); val cv = ctx.freshName("cv")
      s"""
         |if ($xs.numElements() < $centsRef.length * $subDim) {
         |  throw new IllegalArgumentException(
         |    "pq_encode: input vector has " + $xs.numElements() +
         |    " elements, need " + ($centsRef.length * $subDim));
         |}
         |long[] $out = new long[$centsRef.length];
         |for (int $j = 0; $j < $centsRef.length; $j++) {
         |  long $best = Long.MAX_VALUE; long $bc = -1L;
         |  for (int $c = 0; $c < $centsRef[$j].length; $c++) {
         |    long[] $cv = $centsRef[$j][$c];
         |    long $s = $ccsRef[$j][$c];
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      $s -= 2L * $xs.getLong($j * $subDim + $i) * $cv[$i];
         |    }
         |    if ($s < $best) { $best = $s; $bc = $cidsRef[$j][$c]; }
         |  }
         |  $out[$j] = $bc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

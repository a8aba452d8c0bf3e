package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Centroid table in primitive-array form for broadcast shipping:
  * parallel arrays (no per-centroid tuple boxing), cells aligned with
  * vecs by index. */
case class CentroidSet(cells: Array[Long], vecs: Array[Array[Float]])
    extends Serializable

/** The `nprobe` nearest centroid cells for an ARRAY<FLOAT> embedding,
  * ascending by (squared-L2 distance, cell) — the BROADCAST form of
  * `Ann.probeCells`/`Ann.nearestCell` for production cell counts.
  *
  * The literal fold (`typedlit` over the centroid table) ships the whole
  * table inside the serialized plan of EVERY task; this expression holds
  * only a `Broadcast` handle — the table moves to each executor once via
  * torrent blocks and is read with `bc.value` (a lazy local lookup after
  * first access). Plan size and generated code are O(1) in K either way;
  * this fixes the per-task bytes.
  *
  * Distance semantics replicate L2SquaredDistance exactly (floats
  * widened to double, (x−y)² accumulated left-to-right); order replicates
  * the (dist, cell) lexicographic struct sort of the literal-fold path.
  * Centroids whose dimension differs from the input are never selected
  * (the fold form nulls their distance; both forms agree on any corpus
  * with consistent dims). A null input element nulls the result. */
case class ProbeCellsBcast(child: Expression, bc: Broadcast[CentroidSet],
    nprobe: Int) extends UnaryExpression {

  require(nprobe > 0, "nprobe must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"probe_cells expects array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ProbeCellsBcast.probe(input.asInstanceOf[ArrayData], bc.value, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("centroidsBc", bc,
      classOf[Broadcast[CentroidSet]].getName)
    nullSafeCodeGen(ctx, ev, x => {
      val tmp = ctx.freshName("probed")
      s"""
         |ArrayData $tmp = graft.expressions.ProbeCellsBcast.probe(
         |  $x, (graft.expressions.CentroidSet) $bcRef.value(), $nprobe);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ProbeCellsBcast =
    copy(child = newChild)
}

object ProbeCellsBcast {

  /** Shared kernel for interpreted eval and codegen. Returns null on a
    * null input element; otherwise the min(nprobe, |matching centroids|)
    * nearest cells ascending by (distance, cell). */
  def probe(x: ArrayData, cs: CentroidSet, nprobe: Int): ArrayData = {
    val n = x.numElements()
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      i += 1
    }
    val q = new Array[Double](n)
    i = 0
    while (i < n) { q(i) = x.getFloat(i).toDouble; i += 1 }
    // bounded insertion into (dist, cell) arrays — nprobe is small
    val dists = new Array[Double](nprobe)
    val cells = new Array[Long](nprobe)
    var filled = 0
    var c = 0
    val k = cs.vecs.length
    while (c < k) {
      val v = cs.vecs(c)
      if (v.length == n) {
        var acc = 0.0
        i = 0
        while (i < n) {
          val d = q(i) - v(i).toDouble
          acc += d * d
          i += 1
        }
        val cell = cs.cells(c)
        if (filled < nprobe || acc < dists(filled - 1) ||
            (acc == dists(filled - 1) && cell < cells(filled - 1))) {
          var p = if (filled < nprobe) filled else nprobe - 1
          while (p > 0 && (dists(p - 1) > acc ||
              (dists(p - 1) == acc && cells(p - 1) > cell))) {
            dists(p) = dists(p - 1); cells(p) = cells(p - 1); p -= 1
          }
          dists(p) = acc; cells(p) = cell
          if (filled < nprobe) filled += 1
        }
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(cells, filled))
  }
}

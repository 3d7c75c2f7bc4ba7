package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.schema.Turn
import graft.stream.CsrState

/** Batch CSR assembly as a typed Aggregator (SURVEY §2.10) — the
  * batch-parity twin of the streaming [[graft.stream.CsrState]] keyed
  * state: same sorted-seen-set representation, same CSR derivation, so
  * streaming == batch equivalence is testable operator-for-operator.
  */
case class CsrBuf(seen: Array[Int])
case class CsrOut(n_turns: Int, n_edges: Int, min_idx: Int, max_idx: Int,
                  contiguous: Boolean)

object ConvCsrAggregator extends Aggregator[Turn, CsrBuf, CsrOut] {
  type Buf = CsrBuf
  type Out = CsrOut
  private def Buf(seen: Array[Int]) = CsrBuf(seen)

  override def zero: Buf = Buf(Array.empty)

  override def reduce(b: Buf, t: Turn): Buf =
    Buf((b.seen :+ t.turn_idx).distinct)

  override def merge(a: Buf, b: Buf): Buf =
    Buf((a.seen ++ b.seen).distinct)

  override def finish(b: Buf): Out = {
    val seen = b.seen.sorted
    val (_, indices) = CsrState.csrOf(seen)
    CsrOut(
      n_turns = seen.length,
      n_edges = indices.length,
      min_idx = if (seen.isEmpty) -1 else seen.head,
      max_idx = if (seen.isEmpty) -1 else seen.last,
      contiguous = seen.nonEmpty && seen.last - seen.head + 1 == seen.length)
  }

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Out] = Encoders.product[Out]
}

package graft.props

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.gen.SynthTranscripts
import graft.stream.CsrState

/** ScalaCheck properties for the pure (non-Spark) kernels — the
  * property-based upgrade over the reference's example-only tests
  * (SURVEY §5, test plan item 4). Spark-side invariants (symmetrize
  * idempotence, session multiset preservation, dedup idempotence) are
  * covered with fixed seeds in the example suites to keep JVM cost sane.
  */
object KernelProps extends Properties("graft.kernels") {

  private val seenGen: Gen[Array[Int]] =
    Gen.listOf(Gen.choose(0, 200)).map(_.distinct.sorted.toArray)

  private val scoredGen: Gen[List[graft.ops.ScoredRow]] =
    Gen.listOf(for {
      nbr <- Gen.choose(0L, 40L)
      key <- Gen.choose(0, 8).map(_ / 4.0) // coarse keys force ties
    } yield graft.ops.ScoredRow(1L, nbr, key, key))
      // unique (key, nbr) pairs: the ordering contract is total on them
      .map(_.groupBy(r => (r.key, r.nbr_id)).values.map(_.head).toList)

  property("TopKByScore == sort.take(k), reduce and merge paths") =
    forAll(scoredGen) { rows =>
      val agg = new graft.ops.TopKByScore(5)
      def proj(e: graft.ops.TopEntry) = (e.key, e.nbr_id)
      val expect = rows
        .map(r => (r.key, r.nbr_id))
        .sortBy { case (k, n) => (-k, n) }.take(5)
      val viaReduce = rows.foldLeft(agg.zero)(agg.reduce).map(proj)
      val (l, r) = rows.splitAt(rows.length / 2)
      val viaMerge = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce)).map(proj)
      viaReduce == expect && viaMerge == expect
    }

  property("csrOf: indptr is monotone and ends at nnz") = forAll(seenGen) { seen =>
    val (indptr, indices) = CsrState.csrOf(seen)
    indptr.length == seen.length + 1 &&
      indptr.zip(indptr.tail).forall { case (a, b) => a <= b } &&
      (indptr.isEmpty || indptr.last == indices.length)
  }

  property("csrOf: edge count == consecutive-present pairs") = forAll(seenGen) { seen =>
    val present = seen.toSet
    val expected = seen.count(i => present.contains(i + 1))
    CsrState.csrOf(seen)._2.length == expected
  }

  property("csrOf: dense prefix is a chain") = forAll(Gen.choose(1, 100)) { n =>
    val (_, indices) = CsrState.csrOf((0 until n).toArray)
    indices.length == n - 1
  }

  property("synth transcripts: deterministic in seed") =
    forAll(Gen.choose(1L, 1000L), Gen.choose(1, 8), Gen.choose(1, 10)) {
      (seed, convs, turns) =>
        SynthTranscripts.turnRows(convs, turns, seed) ==
          SynthTranscripts.turnRows(convs, turns, seed)
    }

  property("synth transcripts: ts strictly increasing per conversation") =
    forAll(Gen.choose(1L, 500L)) { seed =>
      val rows = SynthTranscripts.turnRows(5, 12, seed)
      rows.groupBy(_.conv_id).values.forall { conv =>
        val ts = conv.sortBy(_.turn_idx).map(_.ts.getTime)
        ts.zip(ts.tail).forall { case (a, b) => a < b }
      }
    }

  property("synth transcripts: turn_idx dense from 0") =
    forAll(Gen.choose(1L, 500L)) { seed =>
      SynthTranscripts.turnRows(4, 9, seed).groupBy(_.conv_id).values.forall {
        conv => conv.map(_.turn_idx).sorted == (0 until conv.size)
      }
    }

  property("media decode stub: deterministic, fixed dim, bounded values") =
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)), Gen.choose(1, 32)) {
      (bytes, dim) =>
        val arr = bytes.toArray
        val a = graft.mm.MediaKernels.decodeStub(arr, dim)
        val b = graft.mm.MediaKernels.decodeStub(arr, dim)
        a.sameElements(b) && a.length == dim && a.forall(v => v >= 0f && v <= 255f)
    }
}

package graft.stream

import org.scalatest.funsuite.AnyFunSuite

/** The state-update merge kernel: sorted-distinct prev + sorted delta →
  * sorted-distinct union, equal to the brute (prev ++ delta).distinct
  * .sorted it replaced (O(n log n) per batch → O(n + d log d)).
  */
class CsrMergeSpec extends AnyFunSuite {

  private def brute(prev: Array[Int], delta: Array[Int]): Array[Int] =
    (prev ++ delta).distinct.sorted

  test("merge equals brute resort on exhaustive small cases") {
    val universes = Seq(
      (Array.empty[Int], Array.empty[Int]),
      (Array.empty[Int], Array(3, 3, 1, 7).sorted),
      (Array(1, 2, 3), Array.empty[Int]),
      (Array(1, 3, 5), Array(2, 4, 6)),
      (Array(1, 3, 5), Array(1, 3, 5, 5)),
      (Array(10, 20), Array(1, 2, 3)),
      (Array(1, 2, 3), Array(10, 20, 20)),
      (Array(5), Array(5, 5, 5)),
      (Array(Int.MinValue, 0, Int.MaxValue), Array(Int.MinValue, -1, -1)))
    universes.foreach { case (p, d) =>
      assert(CsrState.mergeSortedDistinct(p, d).toSeq == brute(p, d).toSeq,
        s"prev=${p.toSeq} delta=${d.toSeq}")
    }
  }

  test("merge equals brute resort on deterministic pseudo-random inputs") {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (0 until 200).foreach { trial =>
      val np = (mix(trial * 3L) % 40).toInt.abs
      val nd = (mix(trial * 3L + 1) % 40).toInt.abs
      val prev = (0 until np).map(i => (mix(trial * 1000L + i) % 50).toInt)
        .distinct.sorted.toArray
      val deltaRaw = (0 until nd)
        .map(i => (mix(trial * 2000L + i) % 50).toInt).toArray
      java.util.Arrays.sort(deltaRaw)
      assert(CsrState.mergeSortedDistinct(prev, deltaRaw).toSeq ==
        brute(prev, deltaRaw).toSeq, s"trial $trial")
    }
  }

  test("csrOf on sorted-distinct state: chain edges between consecutive indices") {
    // {0,1,2, 5,6, 9}: edges 0→1, 1→2, 5→6
    val (indptr, indices) = CsrState.csrOf(Array(0, 1, 2, 5, 6, 9))
    assert(indices.toSeq == Seq(1, 2, 6))
    assert(indptr.toSeq == Seq(0, 1, 2, 2, 3, 3, 3))
    val (ip2, ix2) = CsrState.csrOf(Array.empty[Int])
    assert(ip2.toSeq == Seq(0) && ix2.isEmpty)
  }
}

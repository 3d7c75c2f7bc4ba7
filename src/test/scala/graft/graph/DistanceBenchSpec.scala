package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Perf-regression parity with tests/bench_distance.py: the cached
  * distance matrix (ONE group-labeled BFS reused for all O(P²) pairs,
  * A12/analysis.py:235-239) must beat naive per-pair BFS by ≥4×.
  */
class DistanceBenchSpec extends SparkSuite {
  import spark.implicits._

  // 12 clusters of 4 nodes around a small-diameter hub graph
  private val nGroups = 12
  private lazy val edges = {
    val intra = (0 until nGroups).flatMap { g =>
      Seq((s"g${g}_0", s"g${g}_1"), (s"g${g}_1", s"g${g}_2"),
          (s"g${g}_2", s"g${g}_3"))
    }
    val hub = (0 until nGroups).map(g => (s"g${g}_0", "hub"))
    (intra ++ hub).toDF("src", "dst")
  }
  private lazy val membership = (0 until nGroups)
    .flatMap(g => (0 until 4).map(i => (s"p$g", s"g${g}_$i")))
    .toDF("tag", "node")

  test("cached matrix >= 4x faster than naive per-pair (bench_distance.py:43-59)") {
    edges.count() // materialize input outside timers

    val t0 = System.nanoTime()
    val cached = Graph.groupDistanceMatrix(edges, membership, "min")
    val nCached = cached.count()
    val cachedSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    var nNaive = 0L
    val groups = (0 until nGroups).map(g => s"p$g")
    for (a <- groups; b <- groups if a < b) {
      val setA = membership.where(col("tag") === a).select("node")
      val setB = membership.where(col("tag") === b).select("node")
      nNaive += Graph.setDistance(edges, setA, setB, "min").count()
    }
    val naiveSec = (System.nanoTime() - t1) / 1e9

    assert(nCached == nGroups.toLong * nGroups) // all pairs reachable via hub
    assert(nNaive == groups.combinations(2).size)
    val speedup = naiveSec / cachedSec
    info(f"cached=$cachedSec%.2fs naive=$naiveSec%.2fs speedup=$speedup%.1fx")
    assert(speedup >= 4.0, f"speedup $speedup%.1fx < 4x")
  }

  test("group distance matrix values: dist 2 across hub, 0 to self") {
    val m = Graph.groupDistanceMatrix(edges, membership, "min")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(m(("p0", "p0")) == 0L)
    assert(m(("p0", "p1")) == 2L) // g0_0 → hub → g1_0
    assert(m(("p3", "p7")) == 2L)
  }
}

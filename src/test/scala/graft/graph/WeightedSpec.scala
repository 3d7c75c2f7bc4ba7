package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.gfa.{GfaAnalysis, GfaOptions}

class WeightedSpec extends SparkSuite {
  import spark.implicits._

  test("weighted multi-source dist relaxes through cheaper long path") {
    // a→b→c costs 1+1=2, direct a→c costs 5 → dist(a,c)=2
    val edges = Seq(("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 5.0))
      .toDF("src", "dst", "weight")
    val seeds = Seq(("t", "a")).toDF("tag", "node")
    val d = Graph.weightedMultiSourceDist(edges, seeds)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(d == Map("a" -> 0.0, "b" -> 1.0, "c" -> 2.0))
  }

  test("null weights default to 1.0 (nx weight='weight' semantics)") {
    val edges = Seq(("a", "b", null.asInstanceOf[java.lang.Double]),
                    ("b", "c", java.lang.Double.valueOf(0.5)))
      .toDF("src", "dst", "weight")
    val seeds = Seq(("t", "a")).toDF("tag", "node")
    val d = Graph.weightedMultiSourceDist(edges, seeds)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(d("c") == 1.5)
  }

  test("weighted min with stopSet: exact on a long chain + cheap detour") {
    // 60-edge chain s0→s59 (weight 1 each) with an expensive shortcut
    // s0→s10 (weight 100): target {s10} must come back 10.0 (via the
    // chain), not 100.0 — early termination may not settle on the first
    // arrival, only once no frontier work can beat it
    val chain = (0 until 59).map(i => (s"s$i", s"s${i + 1}", 1.0))
    val edges = (chain :+ ("s0", "s10", 100.0)).toDF("src", "dst", "weight")
    val d = Graph.setDistance(edges,
      Seq("s0").toDF("node"), Seq("s10").toDF("node"),
      method = "min", directed = true, weighted = true)
      .head().getDouble(0)
    assert(d == 10.0)
    // full-graph variant (no stopSet) still converges to the same value
    val full = Graph.weightedMultiSourceDist(edges,
        Seq(("a", "s0")).toDF("tag", "node"), directed = true)
      .where(col("node") === "s10").head().getDouble(2)
    assert(full == 10.0)
  }

  test("mean set-distance averages over pairs (analysis.py:148-158)") {
    // chain a-b-c; A={a,c}, B={b}: pairs (a,b)=1,(c,b)=1 → mean 1.0
    // vs A={a,b}, B={c}: (a,c)=2,(b,c)=1 → mean 1.5 (pair semantics!)
    val edges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val m = Graph.setDistance(edges,
      Seq("a", "b").toDF("node"), Seq("c").toDF("node"), "mean")
      .head().getDouble(0)
    assert(m == 1.5)
  }

  test("weighted sequence distance via RC weight tag") {
    val lines = gfaLines(
      "S\ts1\tAAAA", "S\ts2\tCCCC", "S\ts3\tTTTT",
      "L\ts1\t+\ts2\t+\t0M\tRC:i:2", "L\ts2\t+\ts3\t+\t0M\tRC:i:3",
      "L\ts1\t+\ts3\t+\t0M\tRC:i:9")
    val d = GfaAnalysis.sequenceDistance(lines, "AAAA", "TTTT",
      GfaOptions(weightTag = Some("RC"))).head().getDouble(0)
    assert(d == 5.0) // 2+3 beats direct 9
  }
}

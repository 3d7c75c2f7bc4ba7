package graft.gfa

import graft.SparkSuite

/** Transliterates tests/test_split_alignment.py. */
class SplitAlignmentSpec extends SparkSuite {

  // SAMPLE_GFA: coordinates 0-6 of s1(len 6) onto 0-6 of s2(len 10)
  private def sample = gfaLines(
    "S\ts1\t6", "S\ts2\t10", "E\t*\ts1+\t0\t6\ts2+\t0\t6\t6M")
  // ORIENT_GFA: orientation-only edge, no coordinates
  private def orient = gfaLines(
    "S\ts1\t6", "S\ts2\t10", "E\t*\ts1\t+\ts2\t+")
  // LINK_GFA: a plain link plus a partial alignment
  private def linkG = gfaLines(
    "S\ts1\t6", "S\ts2\t10", "L\ts1\t+\ts2\t-\t0M",
    "E\t*\ts1+\t0\t3\ts2+\t0\t3\t3M")

  test("split yields 3 nodes / 2 edges, path length 2 (test_split_alignment.py:22-28)") {
    val r = SplitAlignment(sample)
    assert(r.nodes.count() == 3)   // s1:0-6, s2:0-6, s2:6-10
    assert(r.edges.count() == 2)   // rewired E + chain s2:0-6 → s2:6-10
    // path s1:0-6 → s2:6-10 has length 2
    val e = r.edges.select("src", "dst")
    val d = graft.graph.Graph.multiSourceBfs(e,
      spark.createDataFrame(Seq(("t", "s1:0-6"))).toDF("tag", "node"))
      .collect().map(x => x.getString(1) -> x.getLong(2)).toMap
    assert(d("s2:6-10") == 2L)
  }

  test("orientation-only edges don't split (test_split_alignment.py:30-36)") {
    val r = SplitAlignment(orient)
    assert(r.nodes.count() == 2)   // full spans only
    assert(r.edges.count() == 1)
    val e = r.edges.head()
    assert((e.getString(0), e.getString(1)) == ("s1:0-6", "s2:0-10"))
  }

  test("plain links survive splitting (test_split_alignment.py:38-47)") {
    val r = SplitAlignment(linkG)
    val nodes = r.nodes.collect().map(_.getString(0)).toSet
    assert(nodes == Set("s1:0-3", "s1:3-6", "s2:0-3", "s2:3-10"))
    val kinds = r.edges.groupBy("kind").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(kinds == Map("edge" -> 1L, "link" -> 1L, "chain" -> 2L))
    // link rewires to full-span nodes = first intervals (no 0-len span)
    val l = r.edges.where(org.apache.spark.sql.functions.col("kind") === "link").head()
    assert((l.getString(0), l.getString(1)) == ("s1:0-3", "s2:0-3"))
    assert((l.getString(2), l.getString(3)) == ("+", "-"))
  }

  test("edges with unknown coordinates are rejected, not dropped silently") {
    val r = SplitAlignment(gfaLines(
      "S\ts1\t6", "S\ts2\t10",
      "E\t*\ts1+\t1\t5\ts2+\t7\t9\t4M",   // mappable (creates its own bps)
      "E\t*\tsX+\t0\t2\ts2+\t0\t2\t2M")) // sX undefined → rejected? sX gets bps too
    // sX never appears as an S record, so it has no intervals → reject
    assert(r.rejectedEdges.count() == 1)
  }
}

package graft.gfa

import graft.SparkSuite

/** Distance-query parity with tests/test_distance.py literals. */
class GfaAnalysisSpec extends SparkSuite {

  // SAMPLE_SEQ_GFA (test_distance.py:13)
  private def seqGfa = gfaLines(
    "S\ts1\tACGT", "S\ts2\tTTTT", "L\ts1\t+\ts2\t+\t0M")

  // SAMPLE_PATH_GFA (test_distance.py:15)
  private def pathGfa = gfaLines(
    "S\ts1\t*", "S\ts2\t*", "S\ts3\t*",
    "L\ts1\t+\ts2\t+\t0M", "L\ts2\t+\ts3\t+\t0M",
    "P\tp1\ts1+,s2+\t*", "P\tp2\ts3+,s2+\t*")

  test("sequence_distance == 1 (test_distance.py:25-29)") {
    val d = GfaAnalysis.sequenceDistance(seqGfa, "ACGT", "TTTT").head()
    assert(d.getLong(0) == 1L)
  }

  test("genome_distance min == 0 on overlapping paths (test_distance.py:32-37)") {
    val d = GfaAnalysis.genomeDistance(pathGfa, "p1", "p2", "min").head()
    assert(d.getLong(0) == 0L)
  }

  test("distance matrix = 2x2 zeros (test_distance.py:40-48)") {
    val m = GfaAnalysis.genomeDistanceMatrix(pathGfa, "min")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(m == Map(("p1", "p1") -> 0L, ("p1", "p2") -> 0L,
                    ("p2", "p1") -> 0L, ("p2", "p2") -> 0L))
  }

  test("duplicate sequences resolve to min distance (test_sequence_duplicates.py)") {
    val lines = gfaLines(
      "S\ta1\tACGT", "S\ta2\tACGT", "S\tb\tTTTT",
      "L\ta1\t+\tb\t+\t0M", "L\tb\t+\ta2\t+\t0M")
    val d = GfaAnalysis.sequenceDistance(lines, "ACGT", "TTTT").head()
    assert(d.getLong(0) == 1L)
  }

  test("disconnected sets yield no distance row (NoPath analog)") {
    val lines = gfaLines("S\ts1\tACGT", "S\ts2\tTTTT")
    val d = GfaAnalysis.sequenceDistance(lines, "ACGT", "TTTT").collect()
    assert(d.isEmpty || d(0).isNullAt(0))
  }

  test("mean distance matrix: directed + multiset golden from reference run") {
    // golden computed by RUNNING genome_distance_matrix(method="mean") on
    // this literal: p1↔p2 = 1/3 (s1 unreachable from {s2,s3} on the
    // DIRECTED chain), p1↔p3 = 0.4 (p3 visits s1 twice — multiset),
    // p2↔p3 = 1/3
    val lines = gfaLines(
      "S\ts1\t*", "S\ts2\t*", "S\ts3\t*",
      "L\ts1\t+\ts2\t+\t0M", "L\ts2\t+\ts3\t+\t0M",
      "P\tp1\ts1+,s2+\t*", "P\tp2\ts3+,s2+\t*", "P\tp3\ts1+,s1+,s3+\t*")
    val m = GfaAnalysis.genomeDistanceMatrix(lines, "mean")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(m.size == 9)
    assert(m(("p1", "p1")) == 0.0)
    assert(math.abs(m(("p1", "p2")) - 1.0 / 3) < 1e-12)
    assert(math.abs(m(("p2", "p1")) - 1.0 / 3) < 1e-12)
    assert(math.abs(m(("p1", "p3")) - 0.4) < 1e-12)
    assert(math.abs(m(("p2", "p3")) - 1.0 / 3) < 1e-12)
  }
}

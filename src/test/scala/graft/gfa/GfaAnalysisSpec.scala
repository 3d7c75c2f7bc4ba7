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

  // weighted fixture (goldens produced by RUNNING the reference with
  // parse_gfa(weight_tag="RC") + analysis.{sequence,genome}_distance and
  // the matrix cache formula, analysis.py:236-266):
  // undirected weighted edges s1-s2=5, s2-s3=2, s1-s3=9;
  // p1=[s1], p2=[s3,s2], p3=[s1,s1,s2] (multiset)
  private def weightedGfa = gfaLines(
    "S\ts1\tACGT", "S\ts2\tTTTT", "S\ts3\tGGGG",
    "L\ts1\t+\ts2\t+\t0M\tRC:i:5",
    "L\ts2\t+\ts3\t+\t0M\tRC:i:2",
    "L\ts1\t+\ts3\t+\t0M\tRC:i:9",
    "P\tp1\ts1+\t*", "P\tp2\ts3+,s2+\t*", "P\tp3\ts1+,s1+,s2+\t*")
  private def wOpts = GfaOptions(directed = false, weightTag = Some("RC"))

  test("weighted sequence_distance == 7.0 (reference golden)") {
    val d = GfaAnalysis.sequenceDistance(weightedGfa, "ACGT", "GGGG", wOpts).head()
    assert(d.getDouble(0) == 7.0)
  }

  test("weighted genome_distance min/mean (reference goldens)") {
    assert(GfaAnalysis.genomeDistance(weightedGfa, "p1", "p2", "min", wOpts)
      .head().getDouble(0) == 5.0)
    assert(GfaAnalysis.genomeDistance(weightedGfa, "p1", "p2", "mean", wOpts)
      .head().getDouble(0) == 6.0)
    // multiset mean: p3 visits s1 twice → pairs weighted twice → 26/6
    assert(math.abs(GfaAnalysis.genomeDistance(weightedGfa, "p3", "p2", "mean", wOpts)
      .head().getDouble(0) - 26.0 / 6) < 1e-12)
  }

  test("weighted genome_distance directed: NoPath when unreachable (reference golden)") {
    val dOpts = GfaOptions(directed = true, weightTag = Some("RC"))
    assert(GfaAnalysis.genomeDistance(weightedGfa, "p1", "p2", "min", dOpts)
      .head().getDouble(0) == 5.0)
    assert(GfaAnalysis.genomeDistance(weightedGfa, "p1", "p2", "mean", dOpts)
      .head().getDouble(0) == 6.0)
    val noPath = GfaAnalysis.genomeDistance(weightedGfa, "p2", "p1", "min", dOpts)
      .collect()
    assert(noPath.isEmpty || noPath(0).isNullAt(0))
  }

  test("weighted distance matrix min+mean (reference cache-formula goldens)") {
    val mMin = GfaAnalysis.genomeDistanceMatrix(weightedGfa, "min", wOpts)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(mMin(("p1", "p2")) == 5.0 && mMin(("p2", "p1")) == 5.0)
    assert(mMin(("p1", "p3")) == 0.0 && mMin(("p2", "p3")) == 0.0)
    val mMean = GfaAnalysis.genomeDistanceMatrix(weightedGfa, "mean", wOpts)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    assert(math.abs(mMean(("p1", "p2")) - 17.0 / 3) < 1e-12)
    assert(math.abs(mMean(("p1", "p3")) - 1.25) < 1e-12)
    assert(math.abs(mMean(("p2", "p3")) - 2.4) < 1e-12)
    assert(mMean(("p3", "p3")) == 0.0)
  }

  test("directed min matrix mirrors the EARLIER path's direction (reference runs)") {
    // the reference walks only the upper triangle in file order and
    // mirrors each cell (analysis.py:265-266): with the one directed
    // edge a1→a2, declaring pa first gives 1.0 in BOTH cells, declaring
    // pb first gives inf in both — order-dependent by reference design
    def m(lines: org.apache.spark.sql.DataFrame) =
      GfaAnalysis.genomeDistanceMatrix(lines, "min",
          GfaOptions(directed = true), emitInf = true)
        .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    val paFirst = m(gfaLines("S\ta1\t*", "S\ta2\t*", "L\ta1\t+\ta2\t+\t0M",
                             "P\tpa\ta1+\t*", "P\tpb\ta2+\t*"))
    assert(paFirst(("pa", "pb")) == 1.0 && paFirst(("pb", "pa")) == 1.0)
    val pbFirst = m(gfaLines("S\ta1\t*", "S\ta2\t*", "L\ta1\t+\ta2\t+\t0M",
                             "P\tpb\ta2+\t*", "P\tpa\ta1+\t*"))
    assert(pbFirst(("pa", "pb")).isPosInfinity &&
           pbFirst(("pb", "pa")).isPosInfinity)
  }

  test("distance matrix emitInf fills unreachable pairs with +inf (reference run)") {
    val lines = gfaLines(
      "S\ta1\t*", "S\ta2\t*", "S\tb1\t*",
      "L\ta1\t+\ta2\t+\t0M",
      "P\tpa\ta1+,a2+\t*", "P\tpb\tb1+\t*")
    for (method <- Seq("min", "mean")) {
      val m = GfaAnalysis.genomeDistanceMatrix(lines, method,
          GfaOptions(directed = true), emitInf = true)
        .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
      assert(m.size == 4, s"$method full matrix")
      assert(m(("pa", "pa")) == 0.0 && m(("pb", "pb")) == 0.0)
      assert(m(("pa", "pb")).isPosInfinity && m(("pb", "pa")).isPosInfinity)
    }
  }

  test("bidirected sequence_distance resolves oriented nodes (reference goldens)") {
    val bOpts = GfaOptions(directed = false, bidirected = true)
    assert(GfaAnalysis.sequenceDistance(seqGfa, "ACGT", "TTTT", bOpts)
      .head().getLong(0) == 1L)
    val bw = gfaLines("S\ts1\tACGT", "S\ts2\tTTTT", "L\ts1\t+\ts2\t+\t0M\tRC:i:5")
    assert(GfaAnalysis.sequenceDistance(bw, "ACGT", "TTTT",
        GfaOptions(directed = false, bidirected = true, weightTag = Some("RC")))
      .head().getDouble(0) == 5.0)
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

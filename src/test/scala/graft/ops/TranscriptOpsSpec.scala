package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.gen.{SynthTranscripts, Transcripts}

class TranscriptOpsSpec extends SparkSuite {

  private lazy val synth = SynthTranscripts.turns(spark, 20, 12).toDF()

  test("derivation is deterministic and turn_idx is dense per conv") {
    val a = Transcripts.turns(spark, "/root/testdata/sf0.001")
    val b = Transcripts.turns(spark, "/root/testdata/sf0.001")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val bad = a.groupBy("conv_id")
      .agg(count(lit(1)).as("n"), max("turn_idx").as("mx"),
           countDistinct("turn_idx").as("d"))
      .where(col("mx") =!= col("n") - 1 || col("d") =!= col("n"))
    assert(bad.isEmpty)
  }

  test("text-equality round trip under (conv_id, turn_idx) ordering") {
    // the north-star invariant: reassembling conversations from the node
    // view reproduces every text byte-identically, in turn order.
    // NOTE: deliberately compares text ARRAYS, not array_join'd strings —
    // array_join over transform(array_sort(collect_list(struct))) showed a
    // \u0001-separator corruption on a handful of groups in this Spark
    // build (see round-1 notes); the engine never uses that pattern.
    val t = Transcripts.turns(spark, "/root/testdata/sf0.001")
    val reassembled = t.groupBy("conv_id")
      .agg(transform(array_sort(collect_list(struct(col("turn_idx"), col("text")))),
                     e => e.getField("text")).as("texts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("conv_id").orderBy("turn_idx")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                   org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val direct = t.select(col("conv_id"),
        collect_list(col("text")).over(w).as("texts2"))
      .dropDuplicates("conv_id")
    val m1 = reassembled.collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val m2 = direct.collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val diffKeys = (m1.keySet ++ m2.keySet).filter(k => m1.get(k) != m2.get(k))
    assert(diffKeys.isEmpty, s"convs differing: ${diffKeys.take(3)}")
    assert(m1.size == t.select("conv_id").distinct().count())
  }

  test("edges: one per non-final turn, chain-shaped (W3)") {
    val e = TurnGraph.edges(synth)
    val turns = synth.count()
    val convs = synth.select("conv_id").distinct().count()
    assert(e.count() == turns - convs)
    assert(e.where(col("dst_idx") =!= col("src_idx") + 1).isEmpty)
    assert(e.where(col("gap_us") <= 0).isEmpty) // ts strictly increasing
  }

  test("sessions: byGap == session_window multiset (T3 parity)") {
    val a = Sessions.byGap(synth, 1800)
      .select("conv_id", "n_turns", "start_ts", "end_ts")
    val b = Sessions.bySessionWindow(synth, "30 minutes")
      .select("conv_id", "n_turns", "start_ts", "end_ts")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // and sessions actually split: more sessions than conversations
    assert(a.count() > synth.select("conv_id").distinct().count())
  }

  test("session turn multiset preserved (G5 invariant)") {
    val s = Sessions.byGap(synth, 1800)
    val total = s.agg(sum("n_turns")).head().getLong(0)
    assert(total == synth.count())
  }

  test("pairing: every user turn with a successor pairs exactly once (J6 batch)") {
    val p = Pairing.userAssistant(synth)
    // synth alternates user/assistant strictly, so pairs = #assistant turns
    val asst = synth.where(col("role") === "assistant").count()
    assert(p.count() == asst)
    assert(p.groupBy("conv_id", "user_idx").count().where(col("count") > 1).isEmpty)
  }

  test("symmetrize is idempotent (A4 property)") {
    val coo = TurnGraph.coo(TurnGraph.edges(synth), DupMode.Sum)
    val s1 = TurnGraph.symmetrize(coo)
    val s2 = TurnGraph.symmetrize(s1)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
  }

  test("node index is dense and ordered by (conv_id, turn_idx) (A1)") {
    val idx = TurnGraph.nodeIndex(synth)
    val n = idx.count()
    assert(idx.agg(max("node_idx")).head().getLong(0) == n - 1)
    assert(idx.agg(min("node_idx")).head().getLong(0) == 0L)
    val misordered = idx.as("a").join(idx.as("b"),
      col("a.conv_id") === col("b.conv_id") &&
      col("a.turn_idx") < col("b.turn_idx") &&
      col("a.node_idx") >= col("b.node_idx"))
    assert(misordered.isEmpty)
  }
}

package graft.schema

import java.sql.Timestamp

/** Core data model of the engine (BASELINE.json:input_hint).
  *
  * A `Turn` is the transcript reinterpretation of a GFA `Segment`
  * (reference: parser.py:11-18): node id = (conv_id, turn_idx), payload =
  * `text` (the segment `sequence`), tags = {role, tool}, event time = `ts`.
  *
  * Engines bind this to an Iceberg table partitioned by
  * `days(ts), bucket(16, conv_id)` in production; in this sandbox the same
  * layout is realized as partitioned parquet behind [[graft.stream.TranscriptSink]].
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: Option[String],
    ts: Timestamp
)

/** Adjacency edge between consecutive turns of one conversation — the
  * transcript analog of a GFA `Link` (reference: parser.py:21-30).
  * `gap_us` is the inter-turn latency in microseconds, the edge "weight"
  * analog of the reference's numeric-tag weight extraction
  * (builders.py:205-209). Integer microseconds keep cross-engine equality
  * exact (no floating-point drift in the oracle compare).
  */
final case class TurnEdge(
    conv_id: String,
    src_idx: Int,
    dst_idx: Int,
    src_role: String,
    dst_role: String,
    gap_us: Long
)

/** One conversation session produced by inactivity-gap segmentation — the
  * transcript analog of split-on-alignment sub-segments
  * (reference: builders.py:302-430).
  */
final case class ConvSession(
    conv_id: String,
    session_idx: Int,
    n_turns: Long,
    start_ts: Timestamp,
    end_ts: Timestamp
)

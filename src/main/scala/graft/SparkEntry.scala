package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.Transcripts
import graft.gfa.{GfaParse, SplitAlignment}
import graft.graph.Graph
import graft.ops.{DupMode, Pairing, Rates, Sessions, TurnGraph}
import graft.sim.{Ivf, Knn}
import graft.text.{Curation, Dedup, Packing, Redaction, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Every transcript query operates on the canonical Turn table derived
  * deterministically from `events.parquet` ([[Transcripts]]); the matching
  * oracle SQL reproduces the identical derivation as a DuckDB CTE, so the
  * driver's row/schema/hash compare is exact (integer microseconds for all
  * time math; no cross-engine floating-point drift).
  */
object SparkEntry {

  private def T(s: SparkSession, dir: String): DataFrame =
    Transcripts.turns(s, dir)
  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Deterministic PII-augmented corpus for the redaction queries: the
    * synthetic documents text contains no digits or '@' (verified
    * corpus-wide), so a scrub over it would be VACUOUS under the oracle.
    * Plant PII-shaped tokens derived from doc_id arithmetic instead —
    * integer-exact, so the DuckDB oracle reconstructs the identical
    * augmented text and the expected REDACTED text by construction (no
    * regex on the oracle side): the compare certifies that
    * [[graft.text.Redaction]]'s regex classes find exactly the planted
    * tokens and nothing else. Plants: doc_id%3==0 → an email appended
    * (doubled when %9==0: multi-match-per-doc coverage), %4==1 → an
    * SSN-shaped 3-2-4 digit group appended, %5==2 → a phone-shaped 3-4
    * group PREPENDED (mid-stream position coverage); classes overlap on
    * shared residues (e.g. doc_id 12: email + phone).
    */
  private def piiDocs(s: SparkSession, dir: String): DataFrame = {
    def m(n: Long) = pmod(col("doc_id"), lit(n))
    val em = concat(lit("user"), m(100).cast("string"),
                    lit("@mail"), m(7).cast("string"), lit(".com"))
    val sn = concat(lpad(m(1000).cast("string"), 3, "0"), lit("-"),
                    lpad(m(100).cast("string"), 2, "0"), lit("-"),
                    lpad(m(10000).cast("string"), 4, "0"))
    val ph = concat(lpad(pmod(col("doc_id") * 7, lit(1000L)).cast("string"), 3, "0"),
                    lit("-"), lpad(m(10000).cast("string"), 4, "0"))
    docs(s, dir).select(col("doc_id"),
      concat(
        when(m(5) === 2, concat(lit("call "), ph, lit(" "))).otherwise(lit("")),
        col("text"),
        when(m(3) === 0, concat(lit(" reach "), em,
          when(m(9) === 0, concat(lit(" and "), em)).otherwise(lit(""))))
          .otherwise(lit("")),
        when(m(4) === 1, concat(lit(" ssn "), sn)).otherwise(lit("")))
        .as("text"))
  }

  /** The documents corpus deterministically re-segmented into newline
    * lines of 8 tokens (the sandbox corpus is single-space prose with no
    * newlines — same construct-the-fixture-in-the-query approach as
    * [[piiDocs]]): gives [[graft.text.Dedup.lineDedup]] a real
    * multi-line corpus whose cross-document duplicate lines arise
    * naturally from the small vocabulary, while the oracle reconstructs
    * identical lines from the raw text with list slicing. The token
    * array is materialized as a column BEFORE the transform lambda (the
    * documented HOF capture trap re-evaluates a captured computed array
    * per element).
    */
  private def linedDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"),
        array_join(
          transform(sequence(lit(0), expr("(size(tk) + 7) div 8 - 1")),
            g => concat_ws(" ", slice(col("tk"), g * 8 + 1, lit(8)))),
          "\n").as("text"))

  /** The growing-corpus feed for incremental exact dedup (the
    * [[piiDocs]] construct-the-fixture approach — the raw corpus has no
    * exact duplicates inside the doc_id < 200 feed): every 7th-residue-3
    * doc streams a BASE document's text (doc_id + 200 — dropped by the
    * base-fingerprint anti-join), every second-batch doc with residue
    * 9 ≡ 7 streams the ORIGINAL text of its first-batch counterpart
    * (doc_id − 100 — dropped by the within-stream dedup state, and
    * always CROSS-batch so the survivor is deterministic), the rest
    * stream their own text.
    */
  private def incDocs(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).where(col("doc_id") < 200)
      .select(col("doc_id"), col("text"))
    val b = docs(s, dir).select(col("doc_id").as("b_id"),
                                col("text").as("b_text"))
    val p = docs(s, dir).select(col("doc_id").as("p_id"),
                                col("text").as("p_text"))
    d.join(b, d("doc_id") + 200 === col("b_id"), "left")
      .join(p, d("doc_id") - 100 === col("p_id"), "left")
      .select(d("doc_id"),
        when(d("doc_id") % 7 === 3, col("b_text"))
          .when(d("doc_id") >= 100 && d("doc_id") % 9 === 7, col("p_text"))
          .otherwise(d("text")).as("text"))
  }

  /** [[incDocs]] computed on the driver over one collected narrow slice
    * (ids < 400 cover the feed plus both lookup ranges): the feed is
    * about to be collected anyway, and the two-join distributed form
    * paid two shuffles per invocation for ~200 rows. Mapping kept in
    * lockstep with [[incDocs]] (pinned equal in StreamFeedSpec).
    */
  private[graft] def incDocsRows(s: SparkSession, dir: String): Array[(Long, String)] = {
    val slice = docs(s, dir).where(col("doc_id") < 400)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    val byId = slice.toMap
    slice.collect {
      case (id, text) if id < 200 =>
        val t =
          if (id % 7 == 3) byId.get(id + 200).orNull
          else if (id >= 100 && id % 9 == 7) byId.get(id - 100).orNull
          else text
        (id, t)
    }.sortBy(_._1)
  }

  /** Flagship query: conversation-graph stats (Q1) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    qStats(spark, "/root/testdata/sf0.001")

  // ------------------------------------------------------------ queries

  /** Q1 compute_stats (analysis.py:33-65), transcript domain: nodes =
    * turns, edges = turns − convs (chain adjacency), paths = components =
    * convs — the structural identities of the base conversation graph give
    * a shuffle-light exact plan (the generic component/degree kernels are
    * exercised against this oracle in ScalaTest).
    */
  private def qStats(s: SparkSession, dir: String): DataFrame = {
    val cs = T(s, dir).groupBy("conv_id").agg(count(lit(1)).as("n"))
    cs.agg(
        sum("n").cast("long").as("nodes"),
        (sum("n") - count(lit(1))).cast("long").as("edges"),
        count(lit(1)).as("paths"),
        count(lit(1)).as("components"),
        max(when(col("n") >= 3, 2).when(col("n") === 2, 1).otherwise(0))
          .as("max_degree"))
      .select(col("nodes"), col("edges"), col("paths"), col("components"),
        col("max_degree"),
        when(col("nodes") > 1,
             lit(2.0) * col("edges") / (col("nodes") * (col("nodes") - 1)))
          .otherwise(lit(0.0)).as("density"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- transcript core (GFA-reinterpreted operators) ---
    "q_stats" -> ((s, dir) => qStats(s, dir)),
    "q_conv_edges" -> ((s, dir) => TurnGraph.edges(T(s, dir))),
    "q_node_index" -> ((s, dir) => TurnGraph.nodeIndex(T(s, dir))),
    "q_sessions" -> ((s, dir) => Sessions.byGap(T(s, dir), 1800)),
    "q_sessions_sw" -> ((s, dir) =>
      Sessions.bySessionWindow(T(s, dir), "30 minutes")),
    // T1/T2/T3 under the driver oracle: the MICRO-BATCH EXECUTION PATH
    // itself — MemoryStream source → watermarked session_window aggregate
    // → append-mode memory sink across three triggers (the third is a
    // far-future sentinel that advances the watermark so every real
    // session finalizes). The sink table must equal the DuckDB islands
    // oracle, so a regression in incremental planning, watermark
    // advancement, or session-state handling breaks the hash match even
    // while the batch twin (q_sessions_sw) stays correct — the batch
    // plans never execute here. The fed subset is [[streamFeed]]-bounded
    // (oracle WHERE in lockstep) — cost independent of sf.
    "q_stream_sessions" -> ((s, dir) => {
      val rows = streamFeed(s, dir)
      if (rows.isEmpty)
        // degrade like every batch query does on an empty turns table
        // (rows.last in runStream would otherwise throw pre-start)
        Sessions.bySessionWindow(T(s, dir), "30 minutes")
          .select("conv_id", "n_turns", "start_ts", "end_ts").limit(0)
      else
        runStream(s, rows, "q_stream_sessions", nSentinels = 1) { src =>
          graft.stream.CepQueries
            .sessionStats(src, watermark = "10 minutes", gap = "30 minutes")
        }
          .select(col("conv_id"), col("n_turns"),
                  col("start_ts").cast("timestamp_ntz").as("start_ts"),
                  col("end_ts").cast("timestamp_ntz").as("end_ts"))
    }),
    // The session-window aggregate's state on the ROCKSDB provider
    // (round-5 continuation): completes state-backend parity across the
    // three state types — q_stream_runs_tws covers custom
    // transformWithState state, this covers BUILT-IN aggregation
    // (session-window merge) state on RocksDB + changelog checkpointing,
    // under the identical islands oracle.
    "q_stream_sessions_rocksdb" -> ((s, dir) => {
      val rows = streamFeed(s, dir)
      if (rows.isEmpty)
        Sessions.bySessionWindow(T(s, dir), "30 minutes")
          .select("conv_id", "n_turns", "start_ts", "end_ts").limit(0)
      else
        graft.stream.StateStores.withRocksDb(s) {
          runStream(s, rows, "q_stream_sessions_rocksdb", nSentinels = 1) {
            src =>
              graft.stream.CepQueries.sessionStats(
                src, watermark = "10 minutes", gap = "30 minutes")
          }
        }
          .select(col("conv_id"), col("n_turns"),
                  col("start_ts").cast("timestamp_ntz").as("start_ts"),
                  col("end_ts").cast("timestamp_ntz").as("end_ts"))
    }),
    // T8/T9/S13 under the driver oracle (round-5): the SAME watermarked
    // session_window aggregate, but the query is KILLED after the first
    // half of the feed and RESTARTED from its checkpoint before the
    // second half + sentinel arrive — conversations and session windows
    // straddle the restart, so the rows are correct only if checkpoint
    // recovery, state re-hydration, and sink idempotence all work
    // (reference analog: node2idx insert-once, builders.py:190-198).
    // Oracle = the identical islands SQL as q_stream_sessions: a restart
    // must be INVISIBLE in the result.
    "q_stream_sessions_resume" -> ((s, dir) => {
      val rows = streamFeed(s, dir)
      if (rows.isEmpty)
        Sessions.bySessionWindow(T(s, dir), "30 minutes")
          .select("conv_id", "n_turns", "start_ts", "end_ts").limit(0)
      else
        runStreamResumed(s, rows, "q_stream_sessions_resume",
                         nSentinels = 1) { src =>
          graft.stream.CepQueries
            .sessionStats(src, watermark = "10 minutes", gap = "30 minutes")
        }
          .select(col("conv_id"), col("n_turns"),
                  col("start_ts").cast("timestamp_ntz").as("start_ts"),
                  col("end_ts").cast("timestamp_ntz").as("end_ts"))
    }),
    // T5/J6 under the driver oracle: the stream-stream join's ACTUAL
    // micro-batch path — both watermarked sides buffered in join state
    // across triggers, matches emitted incrementally, state evicted by
    // the time-range bound. Oracle = the q_pairing SQL restricted to the
    // same fed subset with the same 2 h latency bound.
    "q_stream_pairing" -> ((s, dir) => {
      val rows = streamFeed(s, dir)
      if (rows.isEmpty)
        Pairing.userAssistant(T(s, dir)).limit(0)
      else
        runStream(s, rows, "q_stream_pairing", nSentinels = 1) { src =>
          graft.stream.CepQueries.userAssistantJoin(
            src, watermark = "10 minutes", maxWait = "2 hours")
        }
          .select(col("conv_id"), col("user_idx"), col("asst_idx"),
                  col("latency_us"))
    }),
    // the LEFT OUTER stream-stream join — the third watermark semantic
    // under the oracle: unanswered user turns emit null-padded rows ONLY
    // once the watermark proves no reply can arrive (one batch after it
    // advances → two sentinels). Oracle = the same relation as LEFT JOIN
    // with the assistant-side predicates in the ON clause.
    "q_stream_pairing_outer" -> ((s, dir) => {
      val rows = streamFeed(s, dir)
      if (rows.isEmpty)
        Pairing.userAssistant(T(s, dir)).limit(0)
      else
        runStream(s, rows, "q_stream_pairing_outer", nSentinels = 2,
                  sentinelRoles = Seq("user", "assistant")) { src =>
          graft.stream.CepQueries.userAssistantJoinOuter(
            src, watermark = "10 minutes", maxWait = "2 hours")
        }
          .select(col("conv_id"), col("user_idx"), col("asst_idx"),
                  col("latency_us"))
    }),
    // T6 under the driver oracle: flatMapGroupsWithState keyed CSR state
    // on the ACTUAL incremental path — per-conversation state merged
    // across triggers, finalized by EventTimeTimeout once the sentinel
    // advances the watermark past every conversation's idle horizon
    // (timeouts fire a batch AFTER the watermark advances → two
    // sentinels). Oracle = the q_csr_agg SQL over the same fed subset.
    // idleTimeout must exceed a conversation's 24 h day-span PLUS the
    // watermark jump across the two-batch median split (months of event
    // time) — otherwise a boundary-straddling conversation times out
    // mid-stream and emits TWO partial finals; 48 h idle + 14 d sentinel
    // gaps guarantee exactly one final per conversation.
    "q_stream_csr" -> ((s, dir) => {
      val rows = streamFeed(s, dir)
      if (rows.isEmpty)
        queries("q_csr_agg")(s, dir).limit(0)
      else
        runStream(s, rows, "q_stream_csr", nSentinels = 2,
                  sentinelGapMs = 14L * 24 * 3600 * 1000) { src =>
          import s.implicits._
          graft.stream.CsrState.attach(
              src.withWatermark("ts", "10 minutes").as[graft.schema.Turn],
              idleTimeout = "48 hours")
            .toDF()
        }
          .where(col("is_final"))
          .select(col("conv_id"), col("n_turns"), col("n_edges"),
                  col("min_idx"), col("max_idx"), col("contiguous"))
    }),
    // A14/X2 under the driver oracle (round-5): the SALTED CSR state
    // path — map-side per-partition partial aggregation compacts each
    // conversation's micro-batch slice into one (idxs[], max_ts) row
    // before the keyed-state shuffle ([[graft.stream.CsrState
    // .attachSalted]]); the in-order driver feed makes the output
    // row-identical to q_stream_csr (CsrParitySpec's contract), so the
    // SAME DuckDB oracle hash-checks the hot-key-hardened path.
    "q_stream_csr_salted" -> ((s, dir) => {
      val rows = streamFeed(s, dir)
      if (rows.isEmpty)
        queries("q_csr_agg")(s, dir).limit(0)
      else
        runStream(s, rows, "q_stream_csr_salted", nSentinels = 2,
                  sentinelGapMs = 14L * 24 * 3600 * 1000) { src =>
          import s.implicits._
          // attachSalted declares its own watermark on the partials'
          // max_ts — pass the stream UN-watermarked
          graft.stream.CsrState.attachSalted(
              src.as[graft.schema.Turn], idleTimeout = "48 hours",
              watermarkDelay = "10 minutes")
            .toDF()
        }
          .where(col("is_final"))
          .select(col("conv_id"), col("n_turns"), col("n_edges"),
                  col("min_idx"), col("max_idx"), col("contiguous"))
    }),
    // T7 as a PLAN operator (round-5): streaming exact dedup — distinct
    // text fingerprints emitted on first sight via the stateful
    // streaming dropDuplicates ([[graft.stream.CepQueries
    // .distinctFingerprints]]; global-state form — the offline-corpus
    // shape; the watermark-bounded form's re-emit semantics are pinned
    // in StreamingSpec). Rows emit in their arrival batch, so no
    // sentinel flush is needed — and none is fed, so there is nothing to
    // strip from the sink.
    "q_stream_dedup" -> ((s, dir) => {
      val rows = streamFeed(s, dir)
      if (rows.isEmpty)
        T(s, dir).select(graft.text.TextAnalysis.fingerprint(col("text"))
          .as("fp")).limit(0)
      else
        runStream(s, rows, "q_stream_dedup", nSentinels = 0,
                  dropSentinelRows = identity) { src =>
          graft.stream.CepQueries.distinctFingerprints(src)
        }
    }),
    // CEP sequence pattern on its ACTUAL streaming path (round-5
    // continuation): TOOL{2,} runs detected by [[graft.stream.Patterns
    // .attach]] — flagged turns buffered as keyed state, runs emitted
    // ONCE per conversation at event-time-timeout finalization (an early
    // emit would double-report a run still growing at a batch boundary).
    // Watermark declared UPSTREAM of the tool filter so unflagged turns
    // and the sentinels still advance event time; same 2-sentinel /
    // 48 h-idle timeout contract as q_stream_csr. Oracle = the identical
    // gaps-and-islands SQL as q_tool_runs restricted to the fed subset.
    "q_stream_runs" -> ((s, dir) => {
      val rows = streamFeed(s, dir)
      if (rows.isEmpty)
        graft.stream.Patterns.toolRuns(T(s, dir), minLen = 2).limit(0)
      else
        runStream(s, rows, "q_stream_runs", nSentinels = 2,
                  sentinelGapMs = 14L * 24 * 3600 * 1000) { src =>
          import s.implicits._
          graft.stream.Patterns.attach(
              src.withWatermark("ts", "10 minutes")
                .as[graft.schema.Turn].filter(_.tool.isDefined),
              minLen = 2, idleTimeout = "48 hours")
            .toDF()
        }
    }),
    // The SAME pattern on Spark 4's transformWithState API (round-5
    // continuation): typed ValueState + explicit event-time timers on the
    // RocksDB state-store provider — the arbitrary-stateful successor API,
    // hash-checked against the identical islands oracle so the two state
    // backends/APIs must agree row-for-row ([[graft.stream.Patterns
    // .attachTws]], [[graft.stream.StateStores.withRocksDb]]).
    "q_stream_runs_tws" -> ((s, dir) => {
      val rows = streamFeed(s, dir)
      if (rows.isEmpty)
        graft.stream.Patterns.toolRuns(T(s, dir), minLen = 2).limit(0)
      else
        graft.stream.StateStores.withRocksDb(s) {
          runStream(s, rows, "q_stream_runs_tws", nSentinels = 2,
                    sentinelGapMs = 14L * 24 * 3600 * 1000) { src =>
            import s.implicits._
            graft.stream.Patterns.attachTws(
                src.withWatermark("ts", "10 minutes")
                  .as[graft.schema.Turn].filter(_.tool.isDefined),
                minLen = 2, idleTimeout = "48 hours")
              .toDF()
          }
        }
    }),
    // Stream-STATIC enrichment join (round-5 continuation): every
    // incoming turn joined against a batch dimension (per-conversation
    // first-seen ts) on the actual micro-batch path — the standard
    // dim-lookup shape. The static side carries an explicit broadcast
    // hint: AQE is disabled inside micro-batch plans, so the join
    // strategy must be declared (at 100 TB the dim is the small side by
    // construction — per-tool/per-tenant attributes; a conversation-sized
    // dim would instead be pre-bucketed and the hint dropped). Stateless
    // → rows emit in their arrival batch; no watermark, no sentinels.
    "q_stream_enrich" -> ((s, dir) => {
      val rows = streamFeed(s, dir)
      if (rows.isEmpty)
        T(s, dir).select(col("conv_id"), col("turn_idx"),
          lit(0L).as("offset_us")).limit(0)
      else {
        // static dim materialized once: the static side of a
        // stream-static join re-executes per micro-batch — without the
        // barrier every trigger re-paid the events scan + aggregate
        val dim = T(s, dir).groupBy("conv_id")
          .agg(min(col("ts").cast("timestamp")).as("first_ts"))
          .localCheckpoint(true)
        runStream(s, rows, "q_stream_enrich", nSentinels = 0,
                  dropSentinelRows = identity) { src =>
          src.join(broadcast(dim), "conv_id")
            .select(col("conv_id"), col("turn_idx"),
                    expr("timestampdiff(MICROSECOND, first_ts, ts)")
                      .as("offset_us"))
        }
      }
    }),
    // Incrementally-maintained MATERIALIZED VIEW (round-5 continuation):
    // update-mode streaming aggregation + foreachBatch replace-on-match
    // upsert into a parquet view table — the serving-layer sink semantic
    // (existing keys REPLACED by the fresher aggregate; TranscriptSink's
    // insert-once is the opposite resolution). Update mode emits only
    // CHANGED keys per trigger, so conversations straddling the two-batch
    // feed are upserted twice and the second write must win — exactly
    // what the oracle's full-table group-by certifies.
    "q_stream_matview" -> ((s, dir) => {
      val rows = streamFeed(s, dir)
      if (rows.isEmpty)
        graft.stream.MaterializedView.viewDef(T(s, dir)).limit(0)
      else {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val ms = MemoryStream[graft.schema.Turn](
          org.apache.spark.sql.Encoders.product[graft.schema.Turn],
          s.sqlContext)
        val root = deleteOnExit(
          java.nio.file.Files.createTempDirectory("q_stream_matview"))
        val parts =
          graft.stream.StatePartitions.forVolume(rows.length, minParts = 2)
        val q = graft.stream.StatePartitions.scoped(s, parts) {
          graft.stream.MaterializedView.start(
            ms.toDF(), s"$root/view", s"$root/ckpt")
        }
        try {
          val (b1, b2) = rows.toSeq.splitAt(rows.length / 2)
          ms.addData(b1); q.processAllAvailable()
          ms.addData(b2); q.processAllAvailable()
        } finally q.stop()
        s.read.parquet(s"$root/view")
          .select(col("conv_id"), col("n_turns"), col("n_tool_turns"),
                  col("last_ts").cast("timestamp_ntz").as("last_ts"))
      }
    }),
    // ... and the same view KILLED between the two feed batches and
    // restarted from its checkpoint (round-5 continuation): straddling
    // conversations have their batch-1 aggregate in the table AND their
    // state in the checkpoint; the restarted query must re-hydrate the
    // agg state and the replayed/late upserts must replace, not
    // duplicate — same full-table group-by oracle, restart invisible.
    "q_stream_matview_resume" -> ((s, dir) => {
      val rows = streamFeed(s, dir)
      if (rows.isEmpty)
        graft.stream.MaterializedView.viewDef(T(s, dir)).limit(0)
      else {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val ms = MemoryStream[graft.schema.Turn](
          org.apache.spark.sql.Encoders.product[graft.schema.Turn],
          s.sqlContext)
        val root = deleteOnExit(
          java.nio.file.Files.createTempDirectory("q_stream_matview_resume"))
        val parts =
          graft.stream.StatePartitions.forVolume(rows.length, minParts = 2)
        def start() = graft.stream.StatePartitions.scoped(s, parts) {
          graft.stream.MaterializedView.start(
            ms.toDF(), s"$root/view", s"$root/ckpt")
        }
        val (b1, b2) = rows.toSeq.splitAt(rows.length / 2)
        val q1 = start()
        try { ms.addData(b1); q1.processAllAvailable() } finally q1.stop()
        val q2 = start()
        try { ms.addData(b2); q2.processAllAvailable() } finally q2.stop()
        s.read.parquet(s"$root/view")
          .select(col("conv_id"), col("n_turns"), col("n_tool_turns"),
                  col("last_ts").cast("timestamp_ntz").as("last_ts"))
      }
    }),
    // T6 × T8/T9 (round-5): the flatMapGroupsWithState CSR path KILLED
    // mid-feed and restarted from its checkpoint — conversations straddle
    // the restart, so the finals are correct only if the per-key binary
    // state (the sorted turn-index runs + max event time) re-hydrates
    // from the state store, the EventTimeTimeout re-arms, and the file
    // sink stays idempotent on replay. Same oracle as q_stream_csr: a
    // restart must be invisible. (q_stream_sessions_resume covers the
    // session-window aggregate's restart; this covers the CUSTOM-state
    // codec path, which recovers through a different store format.)
    "q_stream_csr_resume" -> ((s, dir) => {
      val rows = streamFeed(s, dir)
      if (rows.isEmpty)
        queries("q_csr_agg")(s, dir).limit(0)
      else
        runStreamResumed(s, rows, "q_stream_csr_resume", nSentinels = 2,
                         sentinelGapMs = 14L * 24 * 3600 * 1000) { src =>
          import s.implicits._
          graft.stream.CsrState.attach(
              src.withWatermark("ts", "10 minutes").as[graft.schema.Turn],
              idleTimeout = "48 hours")
            .toDF()
        }
          .where(col("is_final"))
          .select(col("conv_id"), col("n_turns"), col("n_edges"),
                  col("min_idx"), col("max_idx"), col("contiguous"))
    }),
    // T4's SLIDING form on its actual micro-batch path (round-5): the
    // same [[graft.ops.Rates.slidingPerRole]] relation IS the streaming
    // query — the unified Dataset API means the batch twin's plan builder
    // runs unchanged over a watermarked stream (each turn lands in
    // width/slide = 2 windows; state is one row per open (window, role),
    // finalized as the watermark passes each window's end). Sentinel rows
    // carry no conv_id in this aggregate → dropped by event time.
    "q_stream_sliding" -> ((s, dir) => {
      val rows = streamFeed(s, dir)
      if (rows.isEmpty)
        Rates.slidingPerRole(T(s, dir), "2 hours", "1 hour").limit(0)
      else {
        val maxRealTs = new java.sql.Timestamp(rows.last.ts.getTime)
        runStream(s, rows, "q_stream_sliding", nSentinels = 1,
                  dropSentinelRows =
                    _.where(col("window_start") <= lit(maxRealTs))) { src =>
          Rates.slidingPerRole(src.withWatermark("ts", "10 minutes"),
                               "2 hours", "1 hour")
        }
          .select(col("window_start").cast("timestamp_ntz").as("window_start"),
                  col("role"), col("n_turns"))
      }
    }),
    // T4 under the driver oracle (round-5): the tumbling per-tool rate on
    // its ACTUAL micro-batch path — and with EXACT distinct conversation
    // counts, via chained stateful window aggregations
    // ([[graft.stream.CepQueries.turnRateExactDistinct]]): streaming aggs
    // cannot run countDistinct, so stage 1 collapses (window, tool,
    // conv_id) and stage 2 re-windows on window_time and counts the
    // collapsed rows. The oracle is the same COUNT(DISTINCT conv_id)
    // SQL as q_turn_rate restricted to the fed subset — the approx-HLL
    // compromise of the plain streaming form is not inherited. Sentinel
    // rows carry no conv_id here; they are dropped by event time (the
    // ≥48 h sentinel gap puts their windows past every real one), and
    // stage-2 finalization lags the watermark by one batch → 3 sentinels.
    "q_stream_rate" -> ((s, dir) => {
      val rows = streamFeed(s, dir)
      if (rows.isEmpty)
        Rates.tumblingPerTool(T(s, dir), "1 hour")
          .select("window_start", "tool", "n_turns", "n_convs").limit(0)
      else {
        val maxRealTs = new java.sql.Timestamp(rows.last.ts.getTime)
        runStream(s, rows, "q_stream_rate", nSentinels = 3,
                  dropSentinelRows =
                    _.where(col("window_start") <= lit(maxRealTs))) { src =>
          graft.stream.CepQueries
            .turnRateExactDistinct(src, watermark = "10 minutes",
                                   width = "1 hour")
        }
          .select(col("window_start").cast("timestamp_ntz").as("window_start"),
                  col("tool"), col("n_turns"), col("n_convs"))
      }
    }),
    // the north rule's "session-window query latency p95" LIVE: per-conv
    // keyed state emits each assistant reply gap (integer µs), a
    // re-declared watermark + windowed EXACT percentile finalizes
    // (p50, p95, max) per (hour, tool) in append mode — chained stateful
    // ops on the real micro-batch path, heartbeat rows keeping the
    // watermark moving through reply-free stretches
    "q_stream_latency" -> ((s, dir) => {
      val rows = streamFeed(s, dir)
      if (rows.isEmpty)
        T(s, dir).select(
          date_trunc("hour", col("ts")).cast("timestamp_ntz").as("window_start"),
          col("tool"), lit(0L).as("n"), lit(0.0).as("p50_us"),
          lit(0.0).as("p95_us"), lit(0L).as("max_us")).limit(0)
      else {
        val maxRealTs = new java.sql.Timestamp(rows.last.ts.getTime)
        runStream(s, rows, "q_stream_latency", nSentinels = 3,
                  dropSentinelRows =
                    _.where(col("window_start") <= lit(maxRealTs))) { src =>
          import s.implicits._
          graft.stream.LatencyStream.windowedReplyLatency(
            src.as[graft.schema.Turn], watermark = "10 minutes",
            width = "1 hour")
        }
          .select(col("window_start").cast("timestamp_ntz").as("window_start"),
                  col("tool"), col("n"), col("p50_us"), col("p95_us"),
                  col("max_us"))
      }
    }),
    // ... and the same metric per SESSION WINDOW — the north-rule phrase
    // verbatim: reply-gap order statistics per session_window × conv over
    // the gap stream, finalized on watermark. The 8 h inactivity gap is
    // sized to the corpus (median spacing between reply events ≈ 7.75 h),
    // so sessions genuinely hold MULTIPLE gaps and the percentile
    // interpolates — a 30 min gap degenerates to one gap per session;
    // heartbeats ride under a disjoint conversation key so they advance
    // the watermark without extending any real session
    "q_stream_session_latency" -> ((s, dir) => {
      val rows = streamFeed(s, dir)
      if (rows.isEmpty)
        T(s, dir).select(
          col("conv_id"),
          col("ts").cast("timestamp_ntz").as("session_start"),
          col("ts").cast("timestamp_ntz").as("session_end"),
          lit(0L).as("n"), lit(0.0).as("p50_us"), lit(0.0).as("p95_us"),
          lit(0L).as("max_us")).limit(0)
      else
        runStream(s, rows, "q_stream_session_latency", nSentinels = 3) { src =>
          import s.implicits._
          graft.stream.LatencyStream.sessionReplyLatency(
            src.as[graft.schema.Turn], watermark = "10 minutes",
            gap = "8 hours")
        }
          .select(col("conv_id"),
                  col("session_start").cast("timestamp_ntz").as("session_start"),
                  col("session_end").cast("timestamp_ntz").as("session_end"),
                  col("n"), col("p50_us"), col("p95_us"), col("max_us"))
    }),
    // Misra-Gries ON THE STREAM: per-hour heavy-hitter terms where the
    // sketch buffer is the streaming aggregation state (window state is
    // O(capacity) at ANY vocabulary — the firehose "trending tokens"
    // shape); partial sketches merge across micro-batches under the same
    // mergeable-summaries bound as the batch map-side combine. The feed's
    // ≤7 distinct terms/window keep capacity 16 in the exact regime, so
    // the plain per-(window, term) count is the oracle.
    "q_stream_heavy" -> ((s, dir) => {
      val rows = streamFeed(s, dir)
      if (rows.isEmpty)
        T(s, dir).select(
          date_trunc("hour", col("ts")).cast("timestamp_ntz").as("window_start"),
          lit("").as("term"), lit(0L).as("cnt")).limit(0)
      else {
        val maxRealTs = new java.sql.Timestamp(rows.last.ts.getTime)
        runStream(s, rows, "q_stream_heavy", nSentinels = 3,
                  dropSentinelRows =
                    _.where(col("window_start") <= lit(maxRealTs))) { src =>
          graft.ops.HeavyHitters.windowedTerms(src, watermark = "10 minutes",
                                               width = "1 hour")
        }
          .select(col("window_start").cast("timestamp_ntz").as("window_start"),
                  col("term"), col("cnt"))
      }
    }),
    "q_turn_rate" -> ((s, dir) => Rates.tumblingPerTool(T(s, dir), "1 hour")),
    "q_role_cube" -> ((s, dir) => Rates.roleToolCube(T(s, dir))),
    "q_pairing" -> ((s, dir) => Pairing.userAssistant(T(s, dir))),
    "q_degree_hist" -> ((s, dir) => {
      import s.implicits._
      val t = T(s, dir)
      val e = TurnGraph.edges(t).select(
        TurnGraph.nodeId(col("conv_id"), col("src_idx")).as("src"),
        TurnGraph.nodeId(col("conv_id"), col("dst_idx")).as("dst"))
      // histogram is tiny (a handful of distinct degrees) → collect once;
      // zero-degree nodes (single-turn convs) by subtraction from the
      // events rowcount (derivation is bijective, metadata-only scan)
      val hist = Graph.degrees(e)
        .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val total = s.read.parquet(s"$dir/events.parquet").count()
      val zero = total - hist.map(_._2).sum
      val rows = if (zero > 0) hist :+ (0L, zero) else hist
      rows.toSeq.toDF("degree", "n_nodes")
    }),
    "q_coo_sym" -> ((s, dir) =>
      TurnGraph.symmetrize(TurnGraph.coo(TurnGraph.edges(T(s, dir)), DupMode.Sum))),
    // T6 batch twin: per-conversation CSR shape — the imperative
    // CsrShapeAgg (same CsrState.csrOf derivation as the streaming
    // flatMapGroupsWithState state; pinned against the typed
    // ConvCsrAggregator in CsrAggSpec). Untyped groupBy so column
    // pruning cuts the plan to (conv_id, turn_idx).
    "q_csr_agg" -> ((s, dir) => T(s, dir)
      .groupBy("conv_id")
      .agg(graft.functions.CsrAgg.csr_shape(col("turn_idx")).as("csr"))
      .select(col("conv_id"),
              col("csr.n_turns").as("n_turns"),
              col("csr.n_edges").as("n_edges"),
              col("csr.min_idx").as("min_idx"),
              col("csr.max_idx").as("max_idx"),
              col("csr.contiguous").as("contiguous"))),
    "q_text_dups" -> ((s, dir) => T(s, dir)
      .groupBy("text")
      .agg(count(lit(1)).as("n_occurrences"),
           min(TurnGraph.nodeId(col("conv_id"), col("turn_idx"))).as("first_node"))
      .where(col("n_occurrences") > 1)),

    "q_sliding_rate" -> ((s, dir) =>
      Rates.slidingPerRole(T(s, dir), "2 hours", "1 hour")),
    // As-of join (round-5 continuation): attribute every tool turn to the
    // latest user turn at-or-before it — the union-tag + running-last
    // single-shuffle plan ([[graft.ops.AsOfJoin]]); the oracle is DuckDB's
    // native ASOF LEFT JOIN, a genuinely independent formulation of the
    // same semantics. Right side pre-reduced to one row per (conv, ts)
    // (max turn_idx) so the matched row is deterministic in both engines.
    "q_asof_attrib" -> ((s, dir) => {
      val t = T(s, dir)
      val userPts = t.where(col("role") === "user")
        .groupBy(col("conv_id"), col("ts").as("u_ts"))
        .agg(max("turn_idx").cast("int").as("user_idx"))
      val toolTurns = t.where(col("tool").isNotNull)
        .select("conv_id", "turn_idx", "tool", "ts")
      graft.ops.AsOfJoin.asOf(toolTurns, userPts, Seq("conv_id"),
          leftTime = "ts", rightTime = "u_ts",
          payload = Seq("user_idx", "u_ts"))
        .select(col("conv_id"), col("turn_idx"), col("tool"),
                col("user_idx"),
                expr("timestampdiff(MICROSECOND, u_ts, ts)").as("gap_us"))
    }),
    // Reply-latency order statistics (round-5 continuation): the north
    // rule's latency p95 as a first-class exact query — integer-µs gaps,
    // interpolated percentiles bit-identical across engines (both compute
    // lo + (hi−lo)·frac at p·(n−1)). [[graft.ops.Quantiles]]; the
    // bounded-memory approx_percentile scale path is pinned against this
    // exact operator in QuantilesSpec.
    "q_latency_quantiles" -> ((s, dir) =>
      graft.ops.Quantiles.replyLatency(T(s, dir))),
    // the same order statistics restricted to INTRA-session gaps (a gap
    // over the 30 min threshold starts a new session, q_sessions'
    // definition — it is absence, not latency)
    "q_session_latency" -> ((s, dir) =>
      graft.ops.Quantiles.sessionReplyLatency(T(s, dir), gapSec = 1800)),
    // CEP pattern, batch twin: maximal runs of ≥2 consecutive tool turns
    // per conversation — gaps-and-islands in one turn-order sort
    // ([[graft.stream.Patterns.toolRuns]]). The streaming path over the
    // same pattern is q_stream_runs.
    "q_tool_runs" -> ((s, dir) =>
      graft.stream.Patterns.toolRuns(T(s, dir), minLen = 2)),
    // Interval-containment join (round-5 continuation): every turn
    // located inside its session's [start_ts, end_ts] interval via the
    // BUCKETIZED equi-join ([[graft.ops.IntervalJoin]] — interval × hour
    // buckets + residual BETWEEN, no per-key cartesian). Oracle = the
    // NAIVE range join over independently recomputed islands intervals,
    // so a bucketization bug that drops/duplicates boundary rows breaks
    // the hash.
    "q_turn_sessions" -> ((s, dir) => {
      val t = T(s, dir)
      val sess = Sessions.byGap(t, 1800)
        .select("conv_id", "session_idx", "start_ts", "end_ts")
      graft.ops.IntervalJoin.containment(
          t.select("conv_id", "turn_idx", "ts"), sess,
          keys = Seq("conv_id"), pointTime = "ts",
          start = "start_ts", end = "end_ts",
          payload = Seq("session_idx"), bucket = "hour")
        .select("conv_id", "turn_idx", "session_idx")
    }),
    // Pivot (round-5 continuation): role × tool count matrix with an
    // EXPLICIT pivot-value list (dynamic value discovery would be a
    // separate pass + nondeterministic column order at scale); absent
    // cells filled 0 to match the oracle's conditional aggregation.
    "q_role_tool_pivot" -> ((s, dir) =>
      T(s, dir)
        .withColumn("tool_k", coalesce(col("tool"), lit("none")))
        .groupBy("role")
        .pivot("tool_k", Seq("error", "purchase", "none"))
        .agg(count(lit(1)))
        .na.fill(0, Seq("error", "purchase", "none"))),
    // Grouped top-k ranking (round-5 continuation): top-2 tools per day
    // by turn count, deterministic tie-break on tool name — the ranked
    // flavor of O7 (the map-side TopK aggregator covers the scored
    // flavor in q_knn_*).
    "q_top_tools_daily" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("day").orderBy(col("n_turns").desc, col("tool").asc)
      T(s, dir).where(col("tool").isNotNull)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("tool"))
        .agg(count(lit(1)).as("n_turns"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 2)
        .select(col("day"), col("tool"), col("n_turns"),
                col("rnk").cast("int").as("rnk"))
    }),
    // Q2 analog: min hop distance between two text classes over the
    // conversation chain graph — closed form (|iₐ−i_b| within a conv); the
    // generic BFS kernel is validated against this class of answers in
    // GfaAnalysisSpec/GraphSpec.
    "q_text_distance" -> ((s, dir) => {
      val t = T(s, dir)
      val a = t.where(col("text").startsWith("click#"))
        .select(col("conv_id"), col("turn_idx").as("ai"))
      val b = t.where(col("text").startsWith("error#"))
        .select(col("conv_id"), col("turn_idx").as("bi"))
      a.join(b, "conv_id")
        .agg(min(abs(col("ai") - col("bi"))).as("dist"))
    }),
    // Q4 analog: conversation-pair similarity by shared turn text (paths
    // sharing segments → distance 0 pairs), bounded to two users' convs
    // and df-capped like every overlap-graph query ([[OverlapDfCap]])
    "q_conv_overlap" -> ((s, dir) => {
      val t = restrictedConvText(s, dir)
      t.as("a").join(t.as("b"),
          col("a.text") === col("b.text") && col("a.conv_id") < col("b.conv_id"))
        .groupBy(col("a.conv_id").as("conv_a"), col("b.conv_id").as("conv_b"))
        .agg(count(lit(1)).as("n_shared"))
    }),

    // A8 under the driver oracle: the GENERIC iterative min-label
    // propagation kernel on a non-chain graph (conversations linked by
    // shared turn text — 33 components incl. one of size 11 at sf0.01),
    // oracled by a DuckDB recursive transitive closure. This is the hard
    // signal that the kernel (not a closed form) is correct.
    "q_components" -> ((s, dir) => {
      val (pairs, nodes) = overlapGraph(s, dir)
      Graph.connectedComponents(pairs, Some(nodes))
        .select(col("node").as("conv_id"), col("label").as("component"))
    }),
    // Q2/A11 under the driver oracle: the generic multi-source BFS kernel
    // on the same overlap graph (depth ≥ 3 at sf0.01), oracled by a
    // DuckDB recursive BFS.
    "q_bfs_dist" -> ((s, dir) => {
      val (pairs, nodes) = overlapGraph(s, dir)
      Graph.multiSourceBfs(
          pairs,
          nodes.where(col("node").startsWith("c0d"))
            .select(lit("a").as("tag"), col("node")),
          directed = false)
        .select(col("node"), col("dist"))
    }),

    // GFA PARSE LAYER under the driver oracle: render the turn graph as
    // GFA text (S records carrying the turn text as sequence, L records
    // carrying the gap as an RC:i tag), parse it back through GfaParse
    // (S5 dispatch, P1 tab-split, P2 S-record disambiguation, P3 tag map,
    // P9 weight extraction), and aggregate — the oracle computes the same
    // totals directly from turns, so any parse-layer regression breaks
    // the hash match.
    "q_gfa_stats" -> ((s, dir) => {
      val t = T(s, dir)
      // a tab/newline inside text would shift the rendered S-record fields
      // and silently truncate the re-parsed sequence — surface it as an
      // error instead of an unexplained oracle hash mismatch
      val safeText = when(col("text").rlike("[\\t\\n\\r]"),
          raise_error(concat(lit("q_gfa_stats: text contains tab/newline in "),
                             col("conv_id"))).cast("string"))
        .otherwise(col("text"))
      val segLines = t.select(concat_ws("\t", lit("S"),
          TurnGraph.nodeId(col("conv_id"), col("turn_idx")), safeText)
        .as("value"))
      val linkLines = TurnGraph.edges(t).select(concat_ws("\t", lit("L"),
          TurnGraph.nodeId(col("conv_id"), col("src_idx")), lit("+"),
          TurnGraph.nodeId(col("conv_id"), col("dst_idx")), lit("+"),
          lit("0M"), concat(lit("RC:i:"), col("gap_us").cast("string")))
        .as("value"))
      val gfa = segLines.unionByName(linkLines)
      val segAgg = GfaParse.segments(gfa).agg(
        count(lit(1)).as("n_segments"),
        sum(length(col("sequence"))).cast("long").as("seq_bytes"))
      val linkAgg = GfaParse.links(gfa).agg(
        count(lit(1)).as("n_links"),
        sum(GfaParse.tagDouble(col("tags"), "RC")).as("total_weight"))
      segAgg.crossJoin(linkAgg)
    }),
    // S2 under the driver oracle: the GZIP-compressed text scan — render
    // the turn table as GFA S records, WRITE an actual .gz text file,
    // read it back through the compressed-scan path, parse, aggregate.
    // The oracle computes the same totals straight from turns, so a
    // regression anywhere in write→gzip→scan→parse breaks the hash.
    "q_gfa_gz_stats" -> ((s, dir) => {
      GfaParse.segments(s.read.text(gzSegLines(s, dir))).agg(
        count(lit(1)).as("n_segments"),
        sum(length(col("sequence"))).cast("long").as("seq_bytes"))
    }),
    // S6 under the driver oracle: unknown-record dispatch — one W record
    // (GFA1.1 walk: NOT in the reference's {S,L,P,E,C,O} dispatch set)
    // per conversation rides along with the S records and an H header;
    // the counted side output must see exactly the W rows (H/F are
    // silently skipped by contract).
    "q_gfa_unknown" -> ((s, dir) => {
      val t = T(s, dir)
      val segLines = t.select(concat_ws("\t", lit("S"),
          TurnGraph.nodeId(col("conv_id"), col("turn_idx")), col("text"))
        .as("value"))
      val wLines = t.select(col("conv_id")).distinct()
        .select(concat_ws("\t", lit("W"), col("conv_id"), lit("1")).as("value"))
      val hLine = s.range(1)
        .select(concat_ws("\t", lit("H"), lit("VN:Z:1.1")).as("value"))
      GfaParse.unknownRecords(segLines.unionByName(wLines).unionByName(hLine))
        .groupBy(col("rtype")).agg(count(lit(1)).as("n_records"))
    }),
    // G5/G6/J2/A10/O1 under the driver oracle: split-on-alignment — each
    // restricted conversation becomes one segment (GFA2 length-form S
    // record, L = total text bytes) with E records aligning consecutive
    // turn spans at cumulative-length coordinates, so the breakpoint set
    // is exactly the cumulative sums and the sub-segment nodes are the
    // per-turn spans — which the oracle recomputes with a window sum. A
    // ghost-segment E per conversation exercises the rejects side output
    // without minting intervals (q_split_rejects).
    "q_split_nodes" -> ((s, dir) =>
      splitResult(s, dir).nodes
        .select(col("node"), col("seg"), col("start"), col("end"),
                col("length"))),
    "q_split_edges" -> ((s, dir) =>
      splitResult(s, dir).edges
        .select(col("src"), col("dst"), col("from_orient"),
                col("to_orient"), col("kind"))),
    "q_split_rejects" -> ((s, dir) =>
      splitResult(s, dir).rejectedEdges
        .agg(count(lit(1)).as("n_rejected"))),
    // A9 under the driver oracle: byte totals (sequence + typed-tag
    // payload) through the ACTUAL GfaAnalysis.byteTotals operator, over S
    // records carrying an LN:i tag — the oracle recomputes both sums
    // (tag map stores "TYPE:VALUE", so its byte length is 2 + digits).
    "q_gfa_bytes" -> ((s, dir) => {
      val t = T(s, dir)
      val segLines = t.select(concat_ws("\t", lit("S"),
          TurnGraph.nodeId(col("conv_id"), col("turn_idx")), col("text"),
          concat(lit("LN:i:"), length(col("text")).cast("string")))
        .as("value"))
      graft.gfa.GfaAnalysis.byteTotals(segLines)
    }),
    // P13 under the driver oracle: the malformed-record side output — a
    // truncated L record (3 fields < the required 5) per conversation
    // rides along with well-formed S records; the permissive-mode rejects
    // stream must count exactly those.
    "q_gfa_malformed" -> ((s, dir) => {
      val t = T(s, dir)
      val segLines = t.select(concat_ws("\t", lit("S"),
          TurnGraph.nodeId(col("conv_id"), col("turn_idx")), col("text"))
        .as("value"))
      val badLines = t.select(col("conv_id")).distinct()
        .select(concat_ws("\t", lit("L"), col("conv_id"), lit("+")).as("value"))
      GfaParse.malformedRecords(segLines.unionByName(badLines))
        .groupBy(col("rtype")).agg(count(lit(1)).as("n_records"))
    }),
    // G2/P7/P8 under the driver oracle: bidirected node synthesis + edge
    // mirroring — conversation-chain L records carry role-derived
    // orientations; GfaGraph.edges(bidirected) must emit the forward
    // `u:o1 → v:o2` AND the reverse-complement twin
    // `v:flip(o2) → u:flip(o1)` for every link, which the oracle rebuilds
    // from turn parity (role alternates with turn_idx).
    "q_gfa_bidir" -> ((s, dir) => {
      val t = Transcripts.fromEvents(
        s.read.parquet(s"$dir/events.parquet").where(col("user_id") < 10))
      val sLines = t.select(concat_ws("\t", lit("S"),
        TurnGraph.nodeId(col("conv_id"), col("turn_idx")), col("text"))
        .as("value"))
      val ori = (r: org.apache.spark.sql.Column) =>
        when(r === "user", lit("+")).otherwise(lit("-"))
      val e = TurnGraph.edges(t)
      val lLines = e.select(concat_ws("\t", lit("L"),
        TurnGraph.nodeId(col("conv_id"), col("src_idx")), ori(col("src_role")),
        TurnGraph.nodeId(col("conv_id"), col("dst_idx")), ori(col("dst_role")),
        lit("0M")).as("value"))
      graft.gfa.GfaGraph.edges(sLines.unionByName(lLines),
          graft.gfa.GfaOptions(bidirected = true))
        .select(col("src"), col("dst"))
    }),
    // G4/P10 under the driver oracle: P-record parse — each conversation
    // rendered as one P line (ordered oriented members, orientation from
    // the role), parsed back through paths→posexplode; every (name, pos,
    // seg, ori) row must equal the turns-derived truth, so member-list
    // splitting, orientation stripping, and ordering are all hash-checked.
    "q_gfa_paths" -> ((s, dir) => {
      val t = T(s, dir)
      val entry = concat(
        TurnGraph.nodeId(col("conv_id"), col("turn_idx")),
        when(col("role") === "user", lit("+")).otherwise(lit("-"))).as("e")
      val pLines = t
        .groupBy("conv_id")
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("turn_idx"), entry))),
                    x => x.getField("e")), ",").as("members"))
        .select(concat_ws("\t", lit("P"), col("conv_id"), col("members"),
                          lit("*")).as("value"))
      GfaParse.pathMembers(pLines)
        .select(col("name"), col("pos"), col("seg"), col("ori"))
    }),

    // Q4 kernel under the driver oracle: all-pairs distance matrix over
    // the overlap graph — groupDistanceMatrix(min) with per-conversation
    // groups vs a DuckDB recursive all-sources BFS
    "q_dist_matrix" -> ((s, dir) => {
      val (pairs, nodes) = overlapGraph(s, dir)
      Graph.groupDistanceMatrix(pairs,
        nodes.select(col("node").as("tag"), col("node")),
        method = "min", directed = false)
    }),
    // Q4 mean under the driver oracle: two user-prefix groups, the
    // reference's two-directional node-to-other-group mean formula
    // (analysis.py:254-262) reproduced in SQL
    "q_dist_matrix_mean" -> ((s, dir) => {
      val (pairs, nodes) = overlapGraph(s, dir)
      val membership = nodes.select(
        when(col("node").startsWith("c0d"), lit("g0")).otherwise(lit("g1"))
          .as("tag"),
        col("node"))
      Graph.groupDistanceMatrix(pairs, membership, method = "mean",
                                directed = false)
    }),

    // Weighted Dijkstra kernel under the driver oracle: label-correcting
    // relaxation over the overlap graph with integer-valued weights
    // (n_shared), vs a DuckDB recursive weighted walk — exact because
    // integer-valued double sums are order-independent
    "q_weighted_dist" -> ((s, dir) => {
      val (_, nodes) = overlapGraph(s, dir)
      Graph.weightedMultiSourceDist(
          overlapGraphWeighted(s, dir),
          nodes.where(col("node").startsWith("c0d"))
            .select(lit("a").as("tag"), col("node")),
          directed = false)
        .select(col("node"), col("dist"))
    }),

    // --- training-data pipeline: documents ---
    "q_doc_dedup" -> ((s, dir) => Dedup.exact(docs(s, dir))),
    "q_doc_quality" -> ((s, dir) => TextAnalysis.quality(graft.ops.Scans.wide(docs(s, dir)))
      .select("doc_id", "n_tokens", "n_alpha", "n_digits", "n_punct",
              "n_stopwords", "is_quality")),
    "q_doc_lang" -> ((s, dir) => graft.ops.Scans.wide(docs(s, dir))
      .select(col("doc_id"), col("lang"),
              TextAnalysis.langPrediction(col("text")).as("pred_lang"))),
    // token counting: whitespace + BPE-ish subword-boundary split
    "q_doc_tokens" -> ((s, dir) => docs(s, dir).select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("ws_tokens"),
      TextAnalysis.bpeishTokenCount(col("text")).as("bpe_tokens"))),
    // benchmark decontamination: the deterministic doc_id%10==7 slice
    // plays the held-out eval set; every remaining (training) doc sharing
    // a word 8-gram with it is flagged with its shared-gram / bench-doc
    // counts (broadcast bench-gram join — see [[Curation.decontaminate]])
    "q_decontam" -> ((s, dir) => {
      val d = docs(s, dir)
      Curation.decontaminate(graft.ops.Scans.wide(d.where(col("doc_id") % 10 =!= 7)),
                             d.where(col("doc_id") % 10 === 7), n = 8)
    }),
    // exactly-stratified deterministic train/val split (10% val per
    // lang×source stratum, md5-ranked)
    "q_train_split" -> ((s, dir) => Curation.stratifiedSplit(docs(s, dir))),
    // Gopher-style repetition-quality features
    "q_doc_repetition" -> ((s, dir) => Curation.repetition(docs(s, dir))),
    // source-mixture epoch weighting (≤4 epochs levelling toward the
    // largest source)
    "q_mix_epochs" -> ((s, dir) => Curation.mixtureEpochs(docs(s, dir))),
    // context-length chunking: 64-token windows advancing by 48 (16-token
    // overlap) — shuffle-free explode, the long-doc prep before packing
    "q_doc_chunks" -> ((s, dir) =>
      Curation.chunk(docs(s, dir), window = 64, stride = 48)),
    // the mixture plan APPLIED: one row per (doc, epoch) training pass,
    // epochs broadcast per source
    "q_mix_apply" -> ((s, dir) => Curation.applyMixture(docs(s, dir))),
    // GPT-style sequence packing coordinates: global token offsets via
    // the TWO-PHASE bucketed prefix sum (bucketSize 128 ⇒ genuinely
    // multi-bucket at every sf), 256-token sequences
    "q_pack_offsets" -> ((s, dir) =>
      Packing.packOffsets(docs(s, dir), budget = 256, bucketSize = 128)),
    // corpus bigram count table, top-5 per source (count + doc frequency
    // — the df side of TF-IDF): row-local gram generation, map-side
    // partial-combined count, top-k window over the vocabulary-sized agg
    "q_ngram_counts" -> ((s, dir) =>
      TextAnalysis.wordNgramTopK(docs(s, dir), n = 2, k = 5)),
    // TF-IDF keyword extraction with the float-free ppm score (within a
    // doc the idf numerator is constant, so tf·1e6 div df ranks exactly
    // like tf-idf — and integer division is bit-identical cross-engine
    // where log() parity is not)
    "q_tfidf_keywords" -> ((s, dir) =>
      TextAnalysis.tfidfKeywords(docs(s, dir), k = 3)),
    // bounded-memory heavy hitters: the imperative Misra-Gries aggregate
    // (functions.MgSketchAgg via HeavyHitters.terms) — at most
    // `capacity` counters per group survive the map-side partial
    // aggregation, so the shuffle is O(groups × capacity) at ANY
    // vocabulary size (a plain count keys state by distinct value). The
    // driver corpus has ≤ 31 distinct words per source, so capacity 64
    // runs the sketch in its EXACT regime (no counter ever evicted) and
    // the oracle is the plain per-(source, term) count; the approximate
    // regime's N/(capacity+1) bound is pinned by HeavyHittersSpec.
    "q_heavy_terms" -> ((s, dir) =>
      graft.ops.HeavyHitters.terms(docs(s, dir), "source", "text",
                                   capacity = 64)),
    // C4-style line-level dedup over the deterministically line-segmented
    // corpus (see [[linedDocs]]): first corpus-order occurrence of each
    // distinct line survives, documents reassemble from their survivors.
    // Skew-safe shape: min(struct) group-by on the line digest (map-side
    // combinable), NOT the row_number window the oracle uses.
    "q_line_dedup" -> ((s, dir) => Dedup.lineDedup(linedDocs(s, dir))),
    // token-budget corpus selection: keep the stopword-ppm-best documents
    // until 2/5 of the corpus's tokens are spent — the global quality
    // ordering runs as a banded TWO-PHASE prefix sum (same machinery
    // class as q_pack_offsets; the corpus-sized relation never does a
    // global sort, and the corpus total falls out of the band totals)
    "q_token_budget" -> ((s, dir) =>
      Curation.tokenBudgetSelect(docs(s, dir), budgetNum = 2, budgetDen = 5)),
    // PII scrub over the deterministically PII-augmented corpus (see
    // [[piiDocs]]): regex-class redaction with per-class counts — one
    // codegen'd corpus map, no UDFs, no shuffle. The oracle CONSTRUCTS
    // the expected redacted text from the plants, so an over- or
    // under-matching regex breaks the hash.
    "q_doc_redact" -> ((s, dir) => Redaction.scrub(graft.ops.Scans.wide(piiDocs(s, dir)))),
    // ... and the scrub's counted side output (the skip-and-warn reject
    // philosophy): per-class total matches + documents touched
    "q_redact_counts" -> ((s, dir) =>
      Redaction.classCounts(Redaction.scrub(graft.ops.Scans.wide(piiDocs(s, dir))))),
    // the SAME scrub relation running unchanged on the actual micro-batch
    // path (unified batch/stream API — the firehose-scrub deployment):
    // stateless column expressions → rows emit in their arrival batch, no
    // watermark, no sentinels. Oracle = q_doc_redact's construct-based
    // oracle restricted to the fed ids.
    "q_stream_redact" -> ((s, dir) => {
      import s.implicits._
      val rows = piiDocs(s, dir).where(col("doc_id") < 200)
        .as[(Long, String)].collect().sortBy(_._1)
      if (rows.isEmpty) Redaction.scrub(piiDocs(s, dir)).limit(0)
      else {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val ms = MemoryStream[(Long, String)](
          org.apache.spark.sql.Encoders.product[(Long, String)],
          s.sqlContext)
        val name = s"q_stream_redact_${System.nanoTime()}"
        val q = Redaction.scrub(ms.toDF().toDF("doc_id", "text"))
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try {
          val (b1, b2) = rows.toSeq.splitAt(rows.length / 2)
          ms.addData(b1); q.processAllAvailable()
          ms.addData(b2); q.processAllAvailable()
        } finally q.stop()
        s.table(name)
      }
    }),
    // incremental EXACT dedup (completing the incremental trio with
    // q_stream_neardup / q_stream_ivf): the [[incDocs]] growing-corpus
    // feed streams in two batches; within-stream first-occurrence is
    // dropDuplicates state, base-known fingerprints drop via the
    // broadcast stream-static anti-join. Oracle reconstructs the same
    // feed with id arithmetic and recomputes both drops in SQL.
    "q_stream_dedup_inc" -> ((s, dir) => {
      import s.implicits._
      // materialize the base fingerprint set once: the static side of a
      // stream-static join is re-executed EVERY micro-batch, so without
      // the barrier each trigger re-paid the corpus scan + distinct
      // shuffle (production reads this table from its parquet snapshot)
      val base = docs(s, dir).where(col("doc_id") >= 200)
        .select(TextAnalysis.fingerprint(col("text")).as("fp")).distinct()
        .localCheckpoint(true)
      val rows = incDocsRows(s, dir)
      if (rows.isEmpty)
        base.select(lit(0L).as("doc_id"), col("fp")).limit(0)
      else {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val ms = MemoryStream[(Long, String)](
          org.apache.spark.sql.Encoders.product[(Long, String)],
          s.sqlContext)
        val name = s"q_stream_dedup_inc_${System.nanoTime()}"
        val q = Dedup.incrementalExact(ms.toDF().toDF("doc_id", "text"), base)
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try {
          val (b1, b2) = rows.toSeq.splitAt(rows.length / 2)
          // incrementalExact's within-batch survivor is arbitrary (see
          // its doc); the oracle's MIN(doc_id) parity holds because the
          // incDocs plants are always CROSS-batch — assert that
          // precondition so a feed change fails loudly, not as an
          // intermittent oracle hash mismatch. The dedup key is the
          // NORMALIZED fingerprint (lower → collapse whitespace → trim),
          // so distinctness is asserted on that form, not raw text.
          def normed(t: String) =
            if (t == null) null
            else t.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ").trim
          Seq(b1, b2).foreach { b =>
            require(b.map(r => normed(r._2)).distinct.size == b.size,
              "q_stream_dedup_inc: within-batch duplicate normalized " +
              "text breaks the deterministic-survivor precondition")
          }
          ms.addData(b1); q.processAllAvailable()
          ms.addData(b2); q.processAllAvailable()
        } finally q.stop()
        s.table(name)
      }
    }),
    // --- post-hash pipelines under the driver oracle (round-5): the
    // xxhash64 signature stage of each query is materialized ONCE per
    // (session, sf) to the deterministic [[graft.ops.OracleSig]] path and
    // read back, so (a) the final result is computed from the very bytes
    // the DuckDB oracle reads — banding joins, hamming/jaccard/cosine
    // verification, winnowing, caps, and ranking are all under the exact
    // row/schema/hash compare now — and (b) the queries exercise the
    // amortized production shape (signature/index tables written once per
    // corpus snapshot, reused across query batches). The hash stage
    // itself stays pinned by planted fixtures (DedupSpec/KnnSpec).
    "q_doc_fingerprints" -> ((s, dir) => {
      val grams = graft.ops.OracleSig.materialize(s, dir, "fp_grams",
          graft.ops.OracleSig.docsFp(docs(s, dir)))(
        TextAnalysis.gramHashes(docs(s, dir), "doc_id", "text", k = 8))
      TextAnalysis.winnowFromGrams(docs(s, dir), grams, "doc_id", w = 4)
        .select(col("doc_id"), size(col("fp")).as("n_fp"))
    }),
    "q_minhash_neardups" -> ((s, dir) => {
      val sh = graft.ops.OracleSig.materialize(s, dir, "mh_sh",
          graft.ops.OracleSig.docsFp(docs(s, dir)))(
        Dedup.shingleTable(docs(s, dir), "doc_id", "text", shingleK = 5))
      val bands = graft.ops.OracleSig.materialize(s, dir, "mh_bands",
          graft.ops.OracleSig.docsFp(docs(s, dir)))(
        Dedup.minhashBands(sh, numHashes = 32, bands = 8))
      Dedup.minhashRankedFrom(sh, bands, limit = 200)
    }),
    // INCREMENTAL near-dup (round-6): the corpus-growth shape — docs with
    // doc_id < 200 arrive as two micro-batches and are banded against the
    // BASE snapshot's materialized signature tables (the same mh_sh /
    // mh_bands parquet as q_minhash_neardups, restricted to ids ≥ 200)
    // plus the earlier batches' signature deltas; verified pairs append
    // per batch (overwrite-by-batch-dir = replay-idempotent). The corpus
    // is never re-shingled — per-batch work is batch-sized. Oracle: the
    // full batch pair relation restricted to pairs with a fed endpoint.
    "q_stream_neardup" -> ((s, dir) => {
      import s.implicits._
      val sh = graft.ops.OracleSig.materialize(s, dir, "mh_sh",
          graft.ops.OracleSig.docsFp(docs(s, dir)))(
        Dedup.shingleTable(docs(s, dir), "doc_id", "text", shingleK = 5))
      val bands = graft.ops.OracleSig.materialize(s, dir, "mh_bands",
          graft.ops.OracleSig.docsFp(docs(s, dir)))(
        Dedup.minhashBands(sh, numHashes = 32, bands = 8))
      val rows = docs(s, dir).where(col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().sortBy(_._1)
      if (rows.isEmpty)
        sh.select(col("id").as("id_a"), col("id").as("id_b"),
                  lit(0.0).as("jaccard")).limit(0)
      else {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val ms = MemoryStream[(Long, String)](
          org.apache.spark.sql.Encoders.product[(Long, String)],
          s.sqlContext)
        val root = deleteOnExit(
          java.nio.file.Files.createTempDirectory("q_stream_neardup"))
        val q = graft.stream.IncrementalNearDup.start(
          ms.toDF().toDF("doc_id", "text"),
          sh.where(col("id") >= 200), bands.where(col("id") >= 200),
          s"$root/delta", s"$root/pairs", s"$root/ckpt", threshold = 0.5)
        try {
          val (b1, b2) = rows.toSeq.splitAt(rows.length / 2)
          ms.addData(b1); q.processAllAvailable()
          ms.addData(b2); q.processAllAvailable()
        } finally q.stop()
        graft.stream.IncrementalNearDup.readPairs(s, s"$root/pairs")
      }
    }),
    // near-dup CLUSTERS (round-5): connected components over the verified
    // MinHash pair graph → one row per multi-doc cluster with the
    // canonical keeper (longest text, ties → lowest id) and the bytes a
    // keep-one-per-cluster pass deletes — the cluster-level shape a
    // training-data dedup actually acts on (A≈B≈C cluster together even
    // when jaccard(A,C) is below threshold). Same materialized signature
    // tables as q_minhash_neardups; the oracle recomputes pairs from the
    // same parquet and clusters them with a recursive min-label CTE.
    "q_dup_clusters" -> ((s, dir) => {
      val sh = graft.ops.OracleSig.materialize(s, dir, "mh_sh",
          graft.ops.OracleSig.docsFp(docs(s, dir)))(
        Dedup.shingleTable(docs(s, dir), "doc_id", "text", shingleK = 5))
      val bands = graft.ops.OracleSig.materialize(s, dir, "mh_bands",
          graft.ops.OracleSig.docsFp(docs(s, dir)))(
        Dedup.minhashBands(sh, numHashes = 32, bands = 8))
      Dedup.clustersFromPairs(
        Dedup.minhashNearDupsFrom(sh, bands, threshold = 0.5), docs(s, dir))
    }),
    // the END-TO-END training-data filter funnel (round-5): language ID →
    // quality gate → exact dedup → near-dup cluster dedup, each stage
    // filtering the previous stage's survivors, reported as per-stage
    // doc/byte counts ([[graft.text.CorpusFilter.funnel]]). One corpus
    // pass computes every per-doc flag; the only corpus-sized shuffle is
    // the fingerprint window; the near-dup drop list (from the same
    // materialized MinHash signatures as q_dup_clusters) broadcasts back.
    "q_corpus_filter" -> ((s, dir) => {
      val sh = graft.ops.OracleSig.materialize(s, dir, "mh_sh",
          graft.ops.OracleSig.docsFp(docs(s, dir)))(
        Dedup.shingleTable(docs(s, dir), "doc_id", "text", shingleK = 5))
      val bands = graft.ops.OracleSig.materialize(s, dir, "mh_bands",
          graft.ops.OracleSig.docsFp(docs(s, dir)))(
        Dedup.minhashBands(sh, numHashes = 32, bands = 8))
      graft.text.CorpusFilter.funnel(docs(s, dir),
        Dedup.minhashNearDupsFrom(sh, bands, threshold = 0.5))
    }),
    "q_simhash_neardups" -> ((s, dir) => {
      val sigs = graft.ops.OracleSig.materialize(s, dir, "sim_sigs",
          graft.ops.OracleSig.docsFp(docs(s, dir)))(
        Dedup.simhash(docs(s, dir), "doc_id", "text"))
      Dedup.simhashNearDupsFrom(sigs, maxHamming = 16)
    }),
    "q_emb_neardups" -> ((s, dir) => {
      // ranked form: best LSH-candidate pairs by cosine (thresholded form
      // is Dedup.embeddingNearDups; synthetic corpus has no >0.8 dups)
      val e = emb(s, dir)
      val sigs = graft.ops.OracleSig.materialize(s, dir, "vec_sigs",
          graft.ops.OracleSig.embFp(emb(s, dir)))(
        Knn.lshSignatures(e, "vec_id", "embedding", bits = 32))
      Dedup.embeddingNearDupsFromSigs(e, sigs, threshold = -1.0)
        .orderBy(col("cosine").desc, col("id_a"), col("id_b")).limit(100)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 3).as("cos3"))
    }),

    // SemDeDup (cluster-scoped semantic dedup): k-means assignment
    // materialized once per corpus snapshot (the same index-artifact
    // discipline as the MinHash/LSH signature tables), pairs confined
    // within clusters, verdict = round-3 cosine to a lower-id cluster
    // mate — the oracle recomputes pairs, cosines, and keeper choice from
    // the materialized assignment + the embeddings table
    "q_sem_dedup" -> ((s, dir) => {
      val e = emb(s, dir)
      val assign = graft.ops.OracleSig.materialize(s, dir, "sem_assign",
          graft.ops.OracleSig.embFp(emb(s, dir))) {
        val cents = Ivf.trainCentroids(e, nClusters = 8, iters = 2,
                                       sampleFactor = 25)
        Ivf.assign(e.select(col("vec_id").as("id"),
                            col("embedding").as("v")), cents)
      }
      Dedup.semanticDedupFromAssign(e, assign, threshold = 0.3)
    }),
    // incremental IVF index maintenance (the ANN analog of
    // q_stream_neardup): centroids trained once on the BASE snapshot
    // (vec_id ≥ 200) and materialized; vectors < 200 arrive as two
    // micro-batches, are hard-assigned against the broadcast centroids
    // with the deterministic round-6 argmax, and publish replay-
    // idempotent inverted-list deltas. Oracle: DuckDB recomputes the
    // argmax from the materialized centroid table + the embeddings view.
    "q_stream_ivf" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir)
      val cents = graft.ops.OracleSig.materialize(s, dir, "ivf_cents",
          graft.ops.OracleSig.embFp(emb(s, dir)))(
        Ivf.trainCentroids(e.where(col("vec_id") >= 200), nClusters = 8,
                           iters = 2, sampleFactor = 25))
      val rows = e.where(col("vec_id") < 200)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect().sortBy(_._1)
      if (rows.isEmpty)
        graft.stream.IncrementalIvf.assignRounded(e, cents).limit(0)
      else {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val ms = MemoryStream[(Long, Seq[Float])](
          org.apache.spark.sql.Encoders.product[(Long, Seq[Float])],
          s.sqlContext)
        val root = deleteOnExit(
          java.nio.file.Files.createTempDirectory("q_stream_ivf"))
        val q = graft.stream.IncrementalIvf.start(
          ms.toDF().toDF("vec_id", "embedding"), cents,
          s"$root/lists", s"$root/ckpt")
        try {
          val (b1, b2) = rows.toSeq.splitAt(rows.length / 2)
          ms.addData(b1); q.processAllAvailable()
          ms.addData(b2); q.processAllAvailable()
        } finally q.stop()
        graft.stream.IncrementalIvf.deltas(s, s"$root/lists")
      }
    }),

    // --- similarity search: embeddings ---
    // self-kNN-graph construction (every vector is a query) — the
    // realistic ANN workload; rank on round(sim, 6) with id tie-break so
    // the brute variant is exactly reproducible in DuckDB (list_dot_product)
    "q_knn_brute" -> ((s, dir) => {
      val e = emb(s, dir)
      Knn.bruteTopK(e, e, 5, simDecimals = 6)
        .select("query_id", "nbr_id", "rank")
    }),
    "q_knn_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      // same materialized signature table as q_emb_neardups (vec_sigs)
      val sigs = graft.ops.OracleSig.materialize(s, dir, "vec_sigs",
          graft.ops.OracleSig.embFp(emb(s, dir)))(
        Knn.lshSignatures(e, "vec_id", "embedding", bits = 32))
      Knn.lshTopKFromSigs(e, sigs, 5, simDecimals = 6)
        .select("query_id", "nbr_id", "rank")
    }),
    // IVF scale path: spherical-k-means inverted lists + nprobe search
    // (deterministic sample-based training) with per-query probe
    // escalation: centroids within 0.35 cosine of the query's best are
    // probed too, capped at 16 — on this near-uniform corpus (IVF's
    // structural worst case) measured recall is 0.81 vs brute at 0.46×
    // brute's candidate volume (IvfTune), while a clustered corpus stays
    // at the base 8 probes (pinned in KnnSpec). Timed cost INCLUDES
    // index training — a real deployment trains once (trainCentroids +
    // invertedLists) and amortizes across query batches via ivfTopKWith.
    "q_knn_ivf" -> ((s, dir) => {
      val e = emb(s, dir)
      // train + assign + probe-escalate once per (session, sf); the
      // materialized candidate set is what the rerank (and the oracle's
      // recomputation of it) reads — its row count is exactly the
      // candidate-volume cost metric IvfTune reports
      val cands = graft.ops.OracleSig.materialize(s, dir, "ivf_cands",
          graft.ops.OracleSig.embFp(emb(s, dir))) {
        val cents = Ivf.trainCentroids(e, nClusters = 32, iters = 2,
                                       sampleFactor = 25)
        Ivf.candidatePairs(e, cents, Ivf.invertedLists(e, cents),
                           nprobe = 8, nprobeMax = 16, escalateMargin = 0.35)
      }
      Ivf.rerankTopK(e, e, cands, 5, simDecimals = 6)
        .select("query_id", "nbr_id", "rank")
    }),

    // --- multimodal plumbing (decode kernels stubbed; see graft.mm) ---
    // f0 = first block mean of the stub decode — pure integer byte
    // arithmetic + one float division, so it IS oracle-exact: float(s)/
    // float(n) and float(double(s)/double(n)) are both the correctly
    // rounded quotient when s, n are small integers
    "q_mm_features" -> ((s, dir) =>
      graft.mm.Media.features(graft.mm.Media.attach(docs(s, dir)))
        .select(col("media_id"), size(col("feature")).as("dim"),
                element_at(col("feature"), 1).as("f0"))),
    "q_mm_frames" -> ((s, dir) =>
      graft.mm.Media.sampleFrames(graft.mm.Media.attach(docs(s, dir)))
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"),
             sum(length(col("frame_bytes"))).as("bytes_kept"))),

    // --- relational muscle (joins/aggregates over the TPC-H-ish tables) ---
    "q1_agg" -> ((s, dir) => s.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"),
           count(lit(1)).as("count_order"),
           countDistinct("l_orderkey").as("n_orders"))),
    "q_mkt_orders" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      val c = s.read.parquet(s"$dir/customer.parquet")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
             countDistinct("o_custkey").as("n_custs"))
    }),
    // TPC-H Q3-shaped: selective filters on all three tables (pushed to
    // the parquet scans), broadcast dimension, fact-fact equi-join;
    // integer-valued quantity sums keep the oracle exact
    "q3_shipping" -> ((s, dir) => {
      val cutoff = lit("1995-03-15").cast("timestamp_ntz")
      val c = s.read.parquet(s"$dir/customer.parquet")
        .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = s.read.parquet(s"$dir/orders.parquet")
        .where(col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderpriority")
      val l = s.read.parquet(s"$dir/lineitem.parquet")
        .where(col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_quantity")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
             sum("l_quantity").as("sum_qty"),
             countDistinct("o_orderkey").as("n_orders"))
    })
  )

  /** Document-frequency cap applied to the overlap-graph text self-join
    * (and mirrored in every derived oracle): texts shared by more than
    * this many conversations are dropped from edge building — the one
    * uncapped m² the engine had left ([[graft.ops.Overlap]]). 64 ≫ the
    * actual max df at test scale (3), so results are unchanged; at 100×
    * one boilerplate error string can't quadratically blow up the join.
    */
  private val OverlapDfCap = graft.ops.Overlap.DefaultMaxDf

  /** Shared non-chain test graph: conversations (restricted to two users'
    * prefixes to bound the self-join) connected when they share a turn
    * text — the q_conv_overlap edge set, symmetrization left to the
    * kernels. Returns (edges src/dst, node set).
    */
  private def overlapGraph(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val t = restrictedConvText(s, dir)
    (graft.ops.Overlap.edges(t), t.select(col("conv_id").as("node")).distinct())
  }

  /** Overlap graph with edge weight = number of shared texts. */
  private def overlapGraphWeighted(s: SparkSession, dir: String): DataFrame =
    graft.ops.Overlap.weightedEdges(restrictedConvText(s, dir))

  /** Shared, persisted base of the overlap-graph queries, df-capped
    * ([[OverlapDfCap]]). Six queries derive from this projection;
    * persist() makes Spark's CacheManager substitute the one materialized
    * relation into every identical sub-plan across those queries in a
    * session (the tiny dimension-sized table is also a CollapseProject
    * barrier for the self-joins above). Memoized per (session, dir) so
    * repeated calls don't re-persist an identical plan (a handle leak and
    * an "already cached" warning in long-lived sessions).
    */
  private val convTextCache = new graft.ops.SessionMemo[String]

  private def restrictedConvText(s: SparkSession, dir: String): DataFrame =
    convTextCache.getOrElseUpdate(s, dir) {
      // the c0d/c1d conv prefixes are exactly users 0 and 1 (conv_id =
      // 'c' + user_id + 'd' + date), so the restriction is applied to
      // the events scan where it pushes into the parquet reader — the
      // turn-rank shuffle then runs over the two users' rows only
      val base = Transcripts.fromEvents(
        s.read.parquet(s"$dir/events.parquet")
          .where(col("user_id").isin(0L, 1L)))
      val ct = graft.ops.Overlap.convText(base, OverlapDfCap)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // no-silent-caps: surface the df-cap's drops once per (session, dir)
      // — every query derived from this base silently excludes these
      // texts from edge building, so their count must be visible. The
      // memo bounds this to one tiny aggregation per session.
      val nDropped = graft.ops.Overlap.droppedTexts(base, OverlapDfCap).count()
      if (nDropped > 0)
        System.err.println(
          s"WARN graft.SparkEntry: overlap df-cap ($OverlapDfCap) dropped " +
          s"$nDropped shared text(s) from edge building for $dir — " +
          "see graft.ops.Overlap.droppedTexts for the list")
      ct
    }

  /** GFA text for the split-alignment oracles: users 0-1's conversations
    * as GFA2 length-form segments (`S conv L`, L = total text bytes),
    * one coordinate E record per adjacent turn pair (from-span = the
    * earlier turn's [cum, cum+len), to-span = the later turn's), and one
    * E per conversation targeting an undeclared ghost segment (a reject
    * by the reference's mapping-KeyError rule, builders.py:385-394,
    * which must NOT mint intervals).
    *
    * Memoized + persisted per (session, dir): [[SplitAlignment]] reads
    * its input from many sub-relations (segments, E/C edges, links,
    * breakpoints), and each reference would otherwise re-execute the
    * whole rank-window rendering DAG — a production caller's input is a
    * file scan (cheap to re-read); this derived input must be
    * materialized once to match that cost shape.
    */
  private val splitLinesCache = new graft.ops.SessionMemo[String]

  /** One [[SplitAlignment]] construction per (session, dir): the Result
    * is memoized inside SplitAlignment by canonicalized input plan, but
    * canonicalizing the fat rendered-GFA DAG itself costs real driver
    * time per lookup — this front memo keys on the cheap (session, dir)
    * pair instead. Holding Results here is safe: their checkpointed-leaf
    * intermediates stay valid regardless of the inner memo's LRU (see
    * SplitAlignment's lifetime note).
    */
  private val splitResultCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), SplitAlignment.Result]

  private def splitResult(s: SparkSession, dir: String): SplitAlignment.Result = {
    splitResultCache.keySet.removeIf(_._1.sparkContext.isStopped)
    splitResultCache.computeIfAbsent((s, dir),
      _ => SplitAlignment(splitGfaLines(s, dir)))
  }

  private def splitGfaLines(s: SparkSession, dir: String): DataFrame =
    splitLinesCache.getOrElseUpdate(s, dir) {
      buildSplitGfaLines(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  private def buildSplitGfaLines(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Transcripts.fromEvents(
      s.read.parquet(s"$dir/events.parquet").where(col("user_id").isin(0L, 1L)))
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    val cums = t
      .select(col("conv_id"), col("turn_idx"), length(col("text")).as("len"))
      .withColumn("cum0",
        coalesce(sum("len").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                 lit(0)).cast("long"))
      .withColumn("cum1", col("cum0") + col("len"))
    val totals = cums.groupBy("conv_id").agg(max("cum1").as("total"))
    val sLines = totals
      .select(concat_ws("\t", lit("S"), col("conv_id"), col("total"))
        .as("value"))
    val nxt = cums
      .withColumn("ncum0", lead("cum0", 1).over(w))
      .withColumn("ncum1", lead("cum1", 1).over(w))
    val eLines = nxt.where(col("ncum0").isNotNull)
      .select(concat_ws("\t", lit("E"), lit("*"),
        concat(col("conv_id"), lit("+")), col("cum0"), col("cum1"),
        concat(col("conv_id"), lit("+")), col("ncum0"), col("ncum1"),
        lit("*")).as("value"))
    val ghostLines = cums.where(col("turn_idx") === 0)
      .select(concat_ws("\t", lit("E"), lit("*"),
        concat(col("conv_id"), lit("+")), lit(0), col("cum1"),
        lit("zz_ghost+"), lit(0), lit(5), lit("*")).as("value"))
    // one coordinate-full C (containment) record per multi-turn
    // conversation: the second turn-span contained in the full segment —
    // rewires to (full-span node, second interval), which equals the
    // first E pair's row, so the oracle just duplicates that row (the C
    // parse path and the (0, L) → full-node mapping override both ride
    // the hash compare)
    val cLines = nxt.where(col("turn_idx") === 0 && col("ncum0").isNotNull)
      .join(totals, Seq("conv_id"))
      .select(concat_ws("\t", lit("C"), lit("*"),
        concat(col("conv_id"), lit("+")), lit(0), col("total"),
        concat(col("conv_id"), lit("+")), col("ncum0"), col("ncum1"),
        lit("*")).as("value"))
    // L records between a user's consecutive conversations (J3: links
    // rewire to FULL-SPAN nodes, here = the first interval conv:0-len₀);
    // window partitioned by the user prefix — no global window. BOTH L
    // syntaxes are exercised (P4): user 0's links in explicit-orientation
    // form, user 1's in id-suffix form (padded to the required 5 fields
    // with a tag) — the parse must land both on the identical oracle rows.
    val wl = Window.partitionBy(substring(col("conv_id"), 1, 2))
      .orderBy("conv_id")
    val lLines = cums.select("conv_id").distinct()
      .withColumn("nconv", lead("conv_id", 1).over(wl))
      .where(col("nconv").isNotNull)
      .select(
        when(substring(col("conv_id"), 2, 1) === "0",
          concat_ws("\t", lit("L"), col("conv_id"), lit("+"),
            col("nconv"), lit("+"), lit("0M")))
        .otherwise(
          concat_ws("\t", lit("L"), concat(col("conv_id"), lit("+")),
            concat(col("nconv"), lit("+")), lit("0M"), lit("XX:i:1")))
        .as("value"))
    sLines.unionByName(eLines).unionByName(ghostLines).unionByName(cLines)
      .unionByName(lLines)
  }

  /** S2's real write→gzip→scan round trip input, written ONCE per
    * (session, sf) to a FIXED per-sf path (mode=overwrite) — the previous
    * shape minted a fresh java.nio temp dir per invocation (3 bench reps
    * + every verify run) and never deleted it, accumulating unbounded
    * /tmp usage across rounds; a fixed overwritten path bounds disk to
    * one copy per sf tag while still exercising the actual gzip write +
    * compressed-scan path on the first call of each session.
    */
  private val gzCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]

  private def gzSegLines(s: SparkSession, dir: String): String = {
    gzCache.keySet.removeIf(_._1.sparkContext.isStopped)
    gzCache.computeIfAbsent((s, dir), { _ =>
      val tag = new java.io.File(dir).getName
      val tmp = s"/tmp/graft_gz/$tag/gfa"
      T(s, dir).select(concat_ws("\t", lit("S"),
          TurnGraph.nodeId(col("conv_id"), col("turn_idx")), col("text"))
        .as("value"))
        .write.mode("overwrite").option("compression", "gzip").text(tmp)
      tmp
    })
  }

  /** Recursive delete-on-JVM-exit for per-invocation stream workdirs
    * (parquet sink + checkpoint, ~kilobytes each — but unbounded across
    * rounds without cleanup).
    */
  private def deleteOnExit(p: java.nio.file.Path): String = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
      } catch { case _: Throwable => () }))
    p.toString
  }

  /** Conv-id pattern of the driver-fed streaming subset: single-digit
    * users — 10 users, ~700 turns at EVERY shipped sf (volume grows with
    * the day span, never the table), so the driver feed stays kilobytes
    * at any scale factor. MemoryStream is driver-fed BY DESIGN; the
    * production path consumes `readStream` directly
    * ([[graft.stream.CepQueries]], [[graft.stream.CsrState]]) and never
    * collects — this bound is a harness contract, and every streaming
    * oracle restricts its turns base in lockstep ([[streamFeedWhere]]).
    */
  private val StreamFeedPattern = "^c[0-9]d"
  private val StreamSentinelConv = "zz_watermark_sentinel"

  /** DuckDB lockstep restriction for the streaming oracles. */
  private val streamFeedWhere =
    "WHERE regexp_matches(conv_id, '^c[0-9]d') AND ts IS NOT NULL"

  /** The bounded driver feed, event-time sorted (no late batches). The
    * subset predicate is applied to the EVENTS SCAN as `user_id < 10`
    * (exactly the conv_ids matching [[StreamFeedPattern]], since
    * conv_id = 'c' + user_id + 'd' + date) — it reaches the parquet
    * reader as a pushed filter and the turn-rank shuffle runs over ~700
    * rows instead of the whole table; ranking within a conversation is
    * untouched by dropping other conversations. Rows with null ts are
    * excluded before the sort (none exist in the driver data; a null
    * event time would NPE here and is undroppable-late by definition) —
    * the oracle WHERE carries the same predicates on its side.
    */
  /** The bounded driver feed for the streaming oracles: the user_id < 10
    * slice (~700 rows at any sf; every streaming oracle restricts in
    * lockstep), Turn-derived and event-time-sorted.
    *
    * The Turn mapping runs ON THE DRIVER over the collected slice: the
    * rows are driver-sized by contract (they are about to be fed through
    * MemoryStream.addData anyway), and routing them through the
    * distributed rank-window derivation first paid a shuffle + window
    * stage per streaming-query invocation just to compute a rank the
    * driver re-sorts afterwards. The collected projection is narrow and
    * the user_id filter pushes into the parquet scan; the mapping below
    * is the same bijective derivation as [[Transcripts.fromEvents]]
    * (conv_id = c<user>d<yyyyMMdd UTC>, turn_idx = 0-based (ts, event_id)
    * rank per conversation, role by parity, text = type#props, tool for
    * error/purchase) — parity with the distributed form is pinned by
    * StreamFeedSpec.
    */
  private[graft] def streamFeed(s: SparkSession, dir: String): Array[graft.schema.Turn] = {
    val raw = s.read.parquet(s"$dir/events.parquet")
      .where(col("user_id") < 10 && col("ts").isNotNull)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
              col("event_id"), col("event_type"), col("props"))
      .collect()
    val dayFmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd")
      .withZone(java.time.ZoneOffset.UTC)
    // full-microsecond event time (Timestamp.getTime truncates to ms —
    // the rank window this replaces ordered by the exact ts value)
    def micros(ts: java.sql.Timestamp): Long =
      ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L
    val rows = raw.map { r =>
      (r.getLong(0), r.getTimestamp(1), r.getLong(2),
       if (r.isNullAt(3)) null else r.getString(3),
       if (r.isNullAt(4)) null else r.getString(4))
    }
    rows.groupBy { case (uid, ts, _, _, _) =>
        s"c${uid}d${dayFmt.format(ts.toInstant)}"
      }
      .iterator
      .flatMap { case (convId, members) =>
        members.sortBy { case (_, ts, eid, _, _) => (micros(ts), eid) }
          .iterator.zipWithIndex
          .map { case ((_, ts, _, etype, props), idx) =>
            graft.schema.Turn(
              convId, idx,
              if (idx % 2 == 0) "user" else "assistant",
              // concat() is null if ANY argument is — replicate exactly
              if (etype == null || props == null) null else s"$etype#$props",
              if (etype == "error" || etype == "purchase") Some(etype)
              else None,
              ts)
          }
      }
      .toArray
      .sortBy(t => (micros(t.ts), t.conv_id, t.turn_idx))
  }

  /** Harness shared by the three driver-oracled streaming queries: feeds
    * `rows` through a MemoryStream in two halves, then `nSentinels`
    * far-future sentinel turns (+48 h apart) that advance the watermark
    * so every real window / state entry finalizes — state TIMEOUTS fire
    * one batch AFTER the watermark advances, so timeout-based operators
    * pass nSentinels = 2. The built streaming DataFrame runs into an
    * append-mode memory sink; returns the sink table minus sentinel rows.
    * State partitions are auto-sized from the fed volume
    * ([[graft.stream.StatePartitions]]); minParts = 2 keeps
    * cross-partition state handling exercised at negligible commit cost.
    */
  private def runStream(s: SparkSession, rows: Array[graft.schema.Turn],
                        tag: String, nSentinels: Int,
                        sentinelGapMs: Long = 48L * 3600 * 1000,
                        // roles the sentinel turns carry: a query whose
                        // per-side watermark operators sit BEHIND role
                        // filters (the stream-stream OUTER join) needs a
                        // sentinel PER SIDE — the global watermark is the
                        // min over sides, and a side whose filter drops
                        // the sentinel is stuck at its real-data horizon
                        sentinelRoles: Seq[String] = Seq("user"),
                        // how to strip the sentinel turns' own rows from
                        // the sink table — aggregates that do not carry
                        // conv_id (q_stream_rate) filter on event time
                        // instead (the ≥48 h sentinel gap guarantees no
                        // real window/state entry overlaps a sentinel's)
                        dropSentinelRows: DataFrame => DataFrame =
                          _.where(col("conv_id") =!= StreamSentinelConv))(
      build: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ms = MemoryStream[graft.schema.Turn](
      org.apache.spark.sql.Encoders.product[graft.schema.Turn], s.sqlContext)
    val name = s"${tag}_${System.nanoTime()}"
    val parts = graft.stream.StatePartitions.forVolume(rows.length, minParts = 2)
    val q = graft.stream.StatePartitions.scoped(s, parts) {
      build(ms.toDF()).writeStream.format("memory").queryName(name)
        .outputMode("append").start()
    }
    try {
      val (b1, b2) = rows.toSeq.splitAt(rows.length / 2)
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      (1 to nSentinels).foreach { i =>
        ms.addData(sentinelRoles.zipWithIndex.map { case (role, j) =>
          graft.schema.Turn(StreamSentinelConv, j, role, "s", None,
            new java.sql.Timestamp(rows.last.ts.getTime + i * sentinelGapMs))
        })
        q.processAllAvailable()
      }
    } finally q.stop()
    dropSentinelRows(s.table(name))
  }

  /** [[runStream]] with a kill/restart in the middle: batch 1 runs under
    * query #1 (checkpointed, parquet sink — a memory sink would lose its
    * rows across the restart), the query is STOPPED, and query #2 —
    * started from the SAME checkpoint over the same MemoryStream — feeds
    * batch 2 + the sentinels. Session/state entries straddling the stop
    * are correct in the output only if the second query re-hydrates the
    * state store from the checkpoint and the file sink stays idempotent
    * on replay — which is exactly what the oracle hash-compare certifies.
    */
  private def runStreamResumed(s: SparkSession,
                               rows: Array[graft.schema.Turn],
                               tag: String, nSentinels: Int,
                               sentinelGapMs: Long = 48L * 3600 * 1000)(
      build: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ms = MemoryStream[graft.schema.Turn](
      org.apache.spark.sql.Encoders.product[graft.schema.Turn], s.sqlContext)
    // a FRESH checkpoint per invocation is required (a reused one would
    // try to resume past offsets a new MemoryStream doesn't hold), so the
    // dir can't be a fixed path — register it for deletion on JVM exit
    // instead, bounding /tmp across rounds
    val root = deleteOnExit(java.nio.file.Files.createTempDirectory(tag))
    val out = s"$root/out"
    val ckpt = s"$root/ckpt"
    val parts = graft.stream.StatePartitions.forVolume(rows.length, minParts = 2)
    def start() = graft.stream.StatePartitions.scoped(s, parts) {
      build(ms.toDF()).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    val (b1, b2) = rows.toSeq.splitAt(rows.length / 2)
    val q1 = start()
    try { ms.addData(b1); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try {
      ms.addData(b2); q2.processAllAvailable()
      (1 to nSentinels).foreach { i =>
        ms.addData(Seq(graft.schema.Turn(StreamSentinelConv, 0, "user", "s",
          None,
          new java.sql.Timestamp(rows.last.ts.getTime + i * sentinelGapMs))))
        q2.processAllAvailable()
      }
    } finally q2.stop()
    s.read.parquet(out).where(col("conv_id") =!= StreamSentinelConv)
  }

  // ------------------------------------------------------------- oracles

  private def tsql(body: String): String = Transcripts.sql(body)

  /** Overlap-graph CTE chain shared by the recursive-kernel oracles —
    * includes the df cap in lockstep with [[restrictedConvText]].
    */
  private val overlapCte =
    s""", ct0 AS (SELECT DISTINCT conv_id, text FROM turns
      |          WHERE conv_id LIKE 'c0d%' OR conv_id LIKE 'c1d%'),
      |ct AS (SELECT conv_id, text FROM ct0
      |       QUALIFY COUNT(*) OVER (PARTITION BY text) <= $OverlapDfCap),
      |ov AS (SELECT DISTINCT a.conv_id AS src, b.conv_id AS dst
      |       FROM ct a JOIN ct b ON a.text = b.text AND a.conv_id < b.conv_id),
      |e AS (SELECT src, dst FROM ov UNION SELECT dst AS src, src AS dst FROM ov)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_stats" -> tsql(
      """, conv_sizes AS (SELECT conv_id, COUNT(*) AS n FROM turns GROUP BY conv_id),
        |s AS (SELECT CAST(SUM(n) AS BIGINT) AS nodes,
        |             CAST(SUM(n) - COUNT(*) AS BIGINT) AS edges,
        |             COUNT(*) AS paths, COUNT(*) AS components,
        |             MAX(CASE WHEN n >= 3 THEN 2 WHEN n = 2 THEN 1 ELSE 0 END) AS max_degree
        |      FROM conv_sizes)
        |SELECT nodes, edges, paths, components, max_degree,
        |       CASE WHEN nodes > 1 THEN 2.0 * edges / (nodes * (nodes - 1))
        |            ELSE 0.0 END AS density
        |FROM s""".stripMargin),
    "q_conv_edges" -> tsql(
      """SELECT conv_id, turn_idx AS src_idx, LEAD(turn_idx) OVER w AS dst_idx,
        |       role AS src_role, LEAD(role) OVER w AS dst_role,
        |       date_diff('microsecond', ts, LEAD(ts) OVER w) AS gap_us
        |FROM turns WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
        |QUALIFY LEAD(turn_idx) OVER w IS NOT NULL""".stripMargin),
    "q_node_index" -> tsql(
      """SELECT conv_id, turn_idx,
        |       CAST(ROW_NUMBER() OVER (ORDER BY conv_id, turn_idx) - 1 AS BIGINT) AS node_idx,
        |       conv_id || ':' || CAST(turn_idx AS VARCHAR) AS node_id
        |FROM turns""".stripMargin),
    "q_sessions" -> tsql(Sessions.byGapOracle(1800)),
    "q_sessions_sw" -> tsql(Sessions.sessionWindowOracle(1800)),
    // identical islands oracle over the lockstep-restricted feed — but
    // the Spark side executes the actual micro-batch streaming path, not
    // the batch plan
    "q_stream_sessions" ->
      tsql(Sessions.sessionWindowOracle(1800, streamFeedWhere)),
    // identical islands oracle — the RocksDB state backend must be
    // invisible in the result
    "q_stream_sessions_rocksdb" ->
      tsql(Sessions.sessionWindowOracle(1800, streamFeedWhere)),
    // IDENTICAL islands oracle — the mid-feed kill/restart on the Spark
    // side must be invisible in the result (checkpoint recovery + state
    // re-hydration + sink idempotence under the hash compare)
    "q_stream_sessions_resume" ->
      tsql(Sessions.sessionWindowOracle(1800, streamFeedWhere)),
    // q_pairing's relation, restricted to the fed subset and bounded by
    // userAssistantJoin's 2 h time-range condition — the Spark side runs
    // the actual stream-stream join with watermarked state
    "q_stream_pairing" -> tsql(
      s"""SELECT u.conv_id, u.turn_idx AS user_idx, a.turn_idx AS asst_idx,
         |       date_diff('microsecond', u.ts, a.ts) AS latency_us
         |FROM turns u JOIN turns a
         |  ON u.conv_id = a.conv_id AND a.turn_idx = u.turn_idx + 1
         |WHERE u.role = 'user' AND a.role = 'assistant'
         |  AND regexp_matches(u.conv_id, '^c[0-9]d')
         |  AND u.ts IS NOT NULL AND a.ts IS NOT NULL
         |  AND date_diff('microsecond', u.ts, a.ts)
         |      BETWEEN 0 AND ${2L * 3600 * 1000000}""".stripMargin),
    // the LEFT OUTER form: assistant-side predicates move into ON so
    // unanswered user turns survive with null asst_idx / latency_us
    "q_stream_pairing_outer" -> tsql(
      s"""SELECT u.conv_id, u.turn_idx AS user_idx, a.turn_idx AS asst_idx,
         |       date_diff('microsecond', u.ts, a.ts) AS latency_us
         |FROM turns u LEFT JOIN turns a
         |  ON u.conv_id = a.conv_id AND a.turn_idx = u.turn_idx + 1
         |  AND a.role = 'assistant' AND a.ts IS NOT NULL
         |  AND date_diff('microsecond', u.ts, a.ts)
         |      BETWEEN 0 AND ${2L * 3600 * 1000000}
         |WHERE u.role = 'user' AND u.ts IS NOT NULL
         |  AND regexp_matches(u.conv_id, '^c[0-9]d')""".stripMargin),
    // q_csr_agg's relation over the fed subset — the Spark side runs the
    // actual flatMapGroupsWithState path and emits these rows only via
    // EventTimeTimeout finalization
    "q_stream_csr" -> tsql(
      s"""SELECT conv_id, CAST(COUNT(*) AS INTEGER) AS n_turns,
         |       CAST(COUNT(*) - 1 AS INTEGER) AS n_edges,
         |       MIN(turn_idx) AS min_idx, MAX(turn_idx) AS max_idx,
         |       (MAX(turn_idx) - MIN(turn_idx) + 1 = COUNT(*)) AS contiguous
         |FROM turns $streamFeedWhere GROUP BY conv_id""".stripMargin),
    // identical oracle — the salted (map-side partial) state path must be
    // row-identical to the plain keyed path on the in-order feed
    "q_stream_csr_salted" -> tsql(
      s"""SELECT conv_id, CAST(COUNT(*) AS INTEGER) AS n_turns,
         |       CAST(COUNT(*) - 1 AS INTEGER) AS n_edges,
         |       MIN(turn_idx) AS min_idx, MAX(turn_idx) AS max_idx,
         |       (MAX(turn_idx) - MIN(turn_idx) + 1 = COUNT(*)) AS contiguous
         |FROM turns $streamFeedWhere GROUP BY conv_id""".stripMargin),
    // the insert-once contract in SQL: one row per distinct normalized
    // fingerprint over the fed subset
    "q_stream_dedup" -> tsql(
      s"""SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ',
         |  'g'))) AS fp
         |FROM turns $streamFeedWhere""".stripMargin),
    // q_tool_runs' gaps-and-islands SQL over the fed subset — the Spark
    // side detects the runs on the stateful streaming path
    "q_stream_runs" -> tsql(
      s""", isl AS (
         |  SELECT conv_id, turn_idx, tool,
         |         turn_idx - ROW_NUMBER() OVER (PARTITION BY conv_id
         |                                       ORDER BY turn_idx) AS grp
         |  FROM turns $streamFeedWhere AND tool IS NOT NULL)
         |SELECT conv_id, MIN(turn_idx) AS start_idx, MAX(turn_idx) AS end_idx,
         |       CAST(COUNT(*) AS INT) AS run_len,
         |       CAST(COUNT(DISTINCT tool) AS INT) AS n_tools
         |FROM isl GROUP BY conv_id, grp HAVING COUNT(*) >= 2""".stripMargin),
    // the materialized view's final content == plain group-by over the
    // fed subset: only true if update-mode deltas + replace-on-match
    // upserts compose correctly across batches
    "q_stream_matview" -> tsql(
      s"""SELECT conv_id, COUNT(*) AS n_turns,
         |       COUNT(tool) AS n_tool_turns, MAX(ts) AS last_ts
         |FROM turns $streamFeedWhere GROUP BY conv_id""".stripMargin),
    // identical oracle — the kill/restart must be invisible in the view
    "q_stream_matview_resume" -> tsql(
      s"""SELECT conv_id, COUNT(*) AS n_turns,
         |       COUNT(tool) AS n_tool_turns, MAX(ts) AS last_ts
         |FROM turns $streamFeedWhere GROUP BY conv_id""".stripMargin),
    // the dim join recomputed relationally: per-conv min ts over the FULL
    // table (identical to the subset's per-conv min — min is per-conv),
    // offset per fed turn
    "q_stream_enrich" -> tsql(
      s""", dim AS (SELECT conv_id, MIN(ts) AS first_ts FROM turns GROUP BY 1)
         |SELECT t.conv_id, t.turn_idx,
         |       date_diff('microsecond', d.first_ts, t.ts) AS offset_us
         |FROM turns t JOIN dim d USING (conv_id)
         |$streamFeedWhere""".stripMargin),
    // identical oracle to q_stream_runs — the transformWithState/RocksDB
    // path must agree with the flatMapGroupsWithState/heap path exactly
    "q_stream_runs_tws" -> tsql(
      s""", isl AS (
         |  SELECT conv_id, turn_idx, tool,
         |         turn_idx - ROW_NUMBER() OVER (PARTITION BY conv_id
         |                                       ORDER BY turn_idx) AS grp
         |  FROM turns $streamFeedWhere AND tool IS NOT NULL)
         |SELECT conv_id, MIN(turn_idx) AS start_idx, MAX(turn_idx) AS end_idx,
         |       CAST(COUNT(*) AS INT) AS run_len,
         |       CAST(COUNT(DISTINCT tool) AS INT) AS n_tools
         |FROM isl GROUP BY conv_id, grp HAVING COUNT(*) >= 2""".stripMargin),
    // identical oracle to q_stream_csr — the mid-feed kill/restart of the
    // custom-state path must be invisible in the result
    "q_stream_csr_resume" -> tsql(
      s"""SELECT conv_id, CAST(COUNT(*) AS INTEGER) AS n_turns,
         |       CAST(COUNT(*) - 1 AS INTEGER) AS n_edges,
         |       MIN(turn_idx) AS min_idx, MAX(turn_idx) AS max_idx,
         |       (MAX(turn_idx) - MIN(turn_idx) + 1 = COUNT(*)) AS contiguous
         |FROM turns $streamFeedWhere GROUP BY conv_id""".stripMargin),
    // q_sliding_rate's SQL over the fed subset — the Spark side runs the
    // batch relation's plan on the actual micro-batch path
    "q_stream_sliding" -> tsql(
      s"""SELECT ws AS window_start, role, COUNT(*) AS n_turns FROM (
         |  SELECT date_trunc('hour', ts) AS ws, role FROM turns
         |  $streamFeedWhere
         |  UNION ALL
         |  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, role FROM turns
         |  $streamFeedWhere
         |) GROUP BY 1, 2""".stripMargin),
    // q_turn_rate's SQL over the fed subset — COUNT(DISTINCT conv_id) is
    // EXACT on both sides: the Spark side gets exactness on the streaming
    // path from the chained two-level window aggregation
    "q_stream_rate" -> tsql(
      s"""SELECT date_trunc('hour', ts) AS window_start, tool,
         |       COUNT(*) AS n_turns, COUNT(DISTINCT conv_id) AS n_convs
         |FROM turns $streamFeedWhere GROUP BY 1, 2""".stripMargin),
    "q_stream_latency" -> tsql(
      s""", gaps AS (
         |  SELECT tool, role, ts, date_diff('microsecond',
         |           lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx),
         |           ts) AS gap_us
         |  FROM turns $streamFeedWhere
         |  QUALIFY role = 'assistant' AND gap_us IS NOT NULL)
         |SELECT date_trunc('hour', ts) AS window_start, tool,
         |       COUNT(*) AS n,
         |       quantile_cont(gap_us, 0.5) AS p50_us,
         |       quantile_cont(gap_us, 0.95) AS p95_us,
         |       MAX(gap_us) AS max_us
         |FROM gaps GROUP BY 1, 2""".stripMargin),
    "q_stream_session_latency" -> tsql(
      s""", gaps AS (
         |  SELECT conv_id, ts, role, date_diff('microsecond',
         |           lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx),
         |           ts) AS gap_us
         |  FROM turns $streamFeedWhere
         |  QUALIFY role = 'assistant' AND gap_us IS NOT NULL),
         |flagged AS (
         |  SELECT conv_id, ts, gap_us,
         |         CASE WHEN LAG(ts) OVER w IS NULL
         |                OR date_diff('microsecond', LAG(ts) OVER w, ts)
         |                   >= ${28800L * 1000000L}
         |              THEN 1 ELSE 0 END AS new_session
         |  FROM gaps
         |  WINDOW w AS (PARTITION BY conv_id ORDER BY ts)),
         |ns AS (
         |  SELECT conv_id, ts, gap_us,
         |         SUM(new_session) OVER (PARTITION BY conv_id ORDER BY ts
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM flagged)
         |SELECT conv_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
         |       COUNT(*) AS n,
         |       quantile_cont(gap_us, 0.5) AS p50_us,
         |       quantile_cont(gap_us, 0.95) AS p95_us,
         |       MAX(gap_us) AS max_us
         |FROM ns GROUP BY conv_id, sid""".stripMargin),
    "q_stream_heavy" -> tsql(
      s"""SELECT date_trunc('hour', ts) AS window_start, word AS term,
         |       CAST(COUNT(*) AS BIGINT) AS cnt
         |FROM (SELECT ts, unnest(string_split(text, ' ')) AS word
         |      FROM turns $streamFeedWhere)
         |GROUP BY 1, 2""".stripMargin),
    "q_turn_rate" -> tsql(
      """SELECT date_trunc('hour', ts) AS window_start, tool,
        |       COUNT(*) AS n_turns, COUNT(DISTINCT conv_id) AS n_convs
        |FROM turns GROUP BY 1, 2""".stripMargin),
    "q_role_cube" -> tsql(
      """SELECT role, tool, COUNT(*) AS n_turns, COUNT(DISTINCT conv_id) AS n_convs,
        |       CAST(GROUPING(role) AS INTEGER) AS g_role,
        |       CAST(GROUPING(tool) AS INTEGER) AS g_tool
        |FROM turns GROUP BY CUBE (role, tool)""".stripMargin),
    "q_pairing" -> tsql(
      """SELECT u.conv_id, u.turn_idx AS user_idx, a.turn_idx AS asst_idx,
        |       date_diff('microsecond', u.ts, a.ts) AS latency_us
        |FROM turns u JOIN turns a
        |  ON u.conv_id = a.conv_id AND a.turn_idx = u.turn_idx + 1
        |WHERE u.role = 'user' AND a.role = 'assistant'
        |  AND date_diff('microsecond', u.ts, a.ts) BETWEEN 0 AND 31536000000000""".stripMargin),
    "q_sliding_rate" -> tsql(
      """SELECT ws AS window_start, role, COUNT(*) AS n_turns FROM (
        |  SELECT date_trunc('hour', ts) AS ws, role FROM turns
        |  UNION ALL
        |  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, role FROM turns
        |) GROUP BY 1, 2""".stripMargin),
    // the as-of semantics recomputed by DuckDB's NATIVE ASOF LEFT JOIN —
    // an independent engine feature, not a mirror of the union-tag plan
    "q_asof_attrib" -> tsql(
      """, user_pts AS (
        |  SELECT conv_id, ts AS u_ts, CAST(MAX(turn_idx) AS INT) AS user_idx
        |  FROM turns WHERE role = 'user' GROUP BY 1, 2),
        |tool_t AS (
        |  SELECT conv_id, turn_idx, tool, ts FROM turns WHERE tool IS NOT NULL)
        |SELECT t.conv_id, t.turn_idx, t.tool, u.user_idx,
        |       date_diff('microsecond', u.u_ts, t.ts) AS gap_us
        |FROM tool_t t ASOF LEFT JOIN user_pts u
        |  ON t.conv_id = u.conv_id AND t.ts >= u.u_ts""".stripMargin),
    "q_latency_quantiles" -> tsql(
      """, gaps AS (
        |  SELECT tool, role, date_diff('microsecond',
        |           lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx),
        |           ts) AS gap_us
        |  FROM turns
        |  QUALIFY role = 'assistant' AND gap_us IS NOT NULL)
        |SELECT tool, COUNT(*) AS n,
        |       quantile_cont(gap_us, 0.5) AS p50_us,
        |       quantile_cont(gap_us, 0.95) AS p95_us,
        |       quantile_cont(gap_us, 0.99) AS p99_us,
        |       MAX(gap_us) AS max_us
        |FROM gaps GROUP BY tool""".stripMargin),
    "q_session_latency" -> tsql(
      """, gaps AS (
        |  SELECT tool, role, date_diff('microsecond',
        |           lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx),
        |           ts) AS gap_us
        |  FROM turns
        |  QUALIFY role = 'assistant' AND gap_us IS NOT NULL
        |          AND gap_us <= 1800 * 1000000)
        |SELECT tool, COUNT(*) AS n,
        |       quantile_cont(gap_us, 0.5) AS p50_us,
        |       quantile_cont(gap_us, 0.95) AS p95_us,
        |       quantile_cont(gap_us, 0.99) AS p99_us,
        |       MAX(gap_us) AS max_us
        |FROM gaps GROUP BY tool""".stripMargin),
    "q_tool_runs" -> tsql(
      """, isl AS (
        |  SELECT conv_id, turn_idx, tool,
        |         turn_idx - ROW_NUMBER() OVER (PARTITION BY conv_id
        |                                       ORDER BY turn_idx) AS grp
        |  FROM turns WHERE tool IS NOT NULL)
        |SELECT conv_id, MIN(turn_idx) AS start_idx, MAX(turn_idx) AS end_idx,
        |       CAST(COUNT(*) AS INT) AS run_len,
        |       CAST(COUNT(DISTINCT tool) AS INT) AS n_tools
        |FROM isl GROUP BY conv_id, grp HAVING COUNT(*) >= 2""".stripMargin),
    // naive range join over independently recomputed islands intervals —
    // the un-bucketized formulation of the containment semantics
    "q_turn_sessions" -> tsql(
      Sessions.islandsCte(1800) +
      """, sess AS (
        |  SELECT conv_id, session_idx, MIN(ts) AS start_ts, MAX(ts) AS end_ts
        |  FROM numbered_sessions GROUP BY 1, 2)
        |SELECT t.conv_id, t.turn_idx, s.session_idx
        |FROM turns t JOIN sess s
        |  ON t.conv_id = s.conv_id
        | AND t.ts BETWEEN s.start_ts AND s.end_ts""".stripMargin),
    "q_role_tool_pivot" -> tsql(
      """SELECT role,
        |       COUNT(*) FILTER (tool = 'error') AS error,
        |       COUNT(*) FILTER (tool = 'purchase') AS purchase,
        |       COUNT(*) FILTER (tool IS NULL) AS none
        |FROM turns GROUP BY role""".stripMargin),
    "q_top_tools_daily" -> tsql(
      """, counts AS (
        |  SELECT date_trunc('day', ts) AS day, tool, COUNT(*) AS n_turns
        |  FROM turns WHERE tool IS NOT NULL GROUP BY 1, 2)
        |SELECT day, tool, n_turns, CAST(rnk AS INT) AS rnk FROM (
        |  SELECT day, tool, n_turns,
        |         ROW_NUMBER() OVER (PARTITION BY day
        |                            ORDER BY n_turns DESC, tool ASC) AS rnk
        |  FROM counts)
        |WHERE rnk <= 2""".stripMargin),
    "q_text_distance" -> tsql(
      """SELECT MIN(ABS(a.turn_idx - b.turn_idx)) AS dist
        |FROM turns a JOIN turns b ON a.conv_id = b.conv_id
        |WHERE a.text LIKE 'click#%' AND b.text LIKE 'error#%'""".stripMargin),
    "q_conv_overlap" -> tsql(
      s""", ct0 AS (SELECT DISTINCT conv_id, text FROM turns
        |           WHERE conv_id LIKE 'c0d%' OR conv_id LIKE 'c1d%'),
        |ct AS (SELECT conv_id, text FROM ct0
        |       QUALIFY COUNT(*) OVER (PARTITION BY text) <= $OverlapDfCap)
        |SELECT a.conv_id AS conv_a, b.conv_id AS conv_b, COUNT(*) AS n_shared
        |FROM ct a JOIN ct b ON a.text = b.text AND a.conv_id < b.conv_id
        |GROUP BY 1, 2""".stripMargin),
    "q_degree_hist" -> tsql(
      """, conv_sizes AS (SELECT conv_id, COUNT(*) AS n FROM turns GROUP BY conv_id),
        |deg AS (
        |  SELECT CAST(0 AS BIGINT) AS degree, COUNT(*) AS n_nodes
        |  FROM conv_sizes WHERE n = 1
        |  UNION ALL
        |  SELECT CAST(1 AS BIGINT), 2 * COUNT(*) FROM conv_sizes WHERE n >= 2
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), CAST(COALESCE(SUM(n - 2), 0) AS BIGINT)
        |  FROM conv_sizes WHERE n >= 3)
        |SELECT degree, n_nodes FROM deg WHERE n_nodes > 0""".stripMargin),
    "q_coo_sym" -> tsql(
      """, e AS (
        |  SELECT conv_id || ':' || CAST(turn_idx AS VARCHAR) AS src,
        |         conv_id || ':' || CAST(LEAD(turn_idx) OVER w AS VARCHAR) AS dst,
        |         CAST(date_diff('microsecond', ts, LEAD(ts) OVER w) AS DOUBLE) AS weight
        |  FROM turns WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
        |  QUALIFY LEAD(turn_idx) OVER w IS NOT NULL),
        |g AS (SELECT src, dst, SUM(weight) AS weight FROM e GROUP BY 1, 2),
        |u AS (SELECT src, dst, weight FROM g
        |      UNION ALL SELECT dst, src, weight FROM g)
        |SELECT src, dst, MAX(weight) AS weight FROM u GROUP BY 1, 2""".stripMargin),
    "q_csr_agg" -> tsql(
      """SELECT conv_id, CAST(COUNT(*) AS INTEGER) AS n_turns,
        |       CAST(COUNT(*) - 1 AS INTEGER) AS n_edges,
        |       MIN(turn_idx) AS min_idx, MAX(turn_idx) AS max_idx,
        |       (MAX(turn_idx) - MIN(turn_idx) + 1 = COUNT(*)) AS contiguous
        |FROM turns GROUP BY conv_id""".stripMargin),
    "q_text_dups" -> tsql(
      """SELECT text, COUNT(*) AS n_occurrences,
        |       MIN(conv_id || ':' || CAST(turn_idx AS VARCHAR)) AS first_node
        |FROM turns GROUP BY text HAVING COUNT(*) > 1""".stripMargin),
    "q_components" -> Transcripts.sqlRecursive(overlapCte +
      """,
        |reach AS (
        |  SELECT conv_id AS node, conv_id AS r FROM (SELECT DISTINCT conv_id FROM ct)
        |  UNION
        |  SELECT reach.node, e.dst FROM reach JOIN e ON reach.r = e.src
        |)
        |SELECT node AS conv_id, MIN(r) AS component FROM reach GROUP BY node""".stripMargin),
    "q_bfs_dist" -> Transcripts.sqlRecursive(overlapCte +
      """,
        |walk AS (
        |  SELECT conv_id AS node, CAST(0 AS BIGINT) AS dist
        |  FROM (SELECT DISTINCT conv_id FROM ct) WHERE conv_id LIKE 'c0d%'
        |  UNION
        |  SELECT e.dst AS node, walk.dist + 1 AS dist
        |  FROM walk JOIN e ON walk.node = e.src WHERE walk.dist < 512
        |)
        |SELECT node, MIN(dist) AS dist FROM walk GROUP BY node""".stripMargin),
    "q_weighted_dist" -> Transcripts.sqlRecursive(overlapCte +
      """,
        |ov2 AS (SELECT a.conv_id AS src, b.conv_id AS dst,
        |               CAST(COUNT(*) AS DOUBLE) AS w
        |        FROM ct a JOIN ct b ON a.text = b.text AND a.conv_id < b.conv_id
        |        GROUP BY 1, 2),
        |e2 AS (SELECT src, dst, w FROM ov2
        |       UNION ALL SELECT dst AS src, src AS dst, w FROM ov2),
        |walk AS (
        |  SELECT conv_id AS node, CAST(0 AS DOUBLE) AS dist
        |  FROM (SELECT DISTINCT conv_id FROM ct) WHERE conv_id LIKE 'c0d%'
        |  UNION
        |  SELECT e2.dst AS node, walk.dist + e2.w AS dist
        |  FROM walk JOIN e2 ON walk.node = e2.src WHERE walk.dist < 1000
        |)
        |SELECT node, MIN(dist) AS dist FROM walk GROUP BY node""".stripMargin),
    "q3_shipping" ->
      """SELECT o_orderpriority, COUNT(*) AS n_lines,
        |       SUM(l_quantity) AS sum_qty,
        |       COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |            JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY 1""".stripMargin,
    "q_gfa_gz_stats" -> tsql(
      """SELECT COUNT(*) AS n_segments,
        |       CAST(SUM(LENGTH(text)) AS BIGINT) AS seq_bytes
        |FROM turns""".stripMargin),
    "q_gfa_unknown" -> tsql(
      """SELECT 'W' AS rtype, COUNT(DISTINCT conv_id) AS n_records
        |FROM turns HAVING COUNT(DISTINCT conv_id) > 0""".stripMargin),
    "q_split_nodes" -> tsql(
      """, c AS (
        |  SELECT conv_id,
        |         CAST(COALESCE(SUM(LENGTH(text)) OVER (
        |           PARTITION BY conv_id ORDER BY turn_idx
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS INTEGER) AS a,
        |         CAST(LENGTH(text) AS INTEGER) AS len
        |  FROM turns WHERE conv_id LIKE 'c0d%' OR conv_id LIKE 'c1d%')
        |SELECT conv_id || ':' || CAST(a AS VARCHAR) || '-' ||
        |         CAST(a + len AS VARCHAR) AS node,
        |       conv_id AS seg, a AS start, a + len AS "end", len AS length
        |FROM c""".stripMargin),
    "q_split_edges" -> tsql(
      """, c AS (
        |  SELECT conv_id, turn_idx,
        |         CAST(COALESCE(SUM(LENGTH(text)) OVER (
        |           PARTITION BY conv_id ORDER BY turn_idx
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS INTEGER) AS a,
        |         CAST(LENGTH(text) AS INTEGER) AS len
        |  FROM turns WHERE conv_id LIKE 'c0d%' OR conv_id LIKE 'c1d%'),
        |p AS (
        |  SELECT conv_id, turn_idx,
        |         conv_id || ':' || CAST(a AS VARCHAR) || '-' ||
        |           CAST(a + len AS VARCHAR) AS src,
        |         LEAD(conv_id || ':' || CAST(a AS VARCHAR) || '-' ||
        |           CAST(a + len AS VARCHAR)) OVER
        |           (PARTITION BY conv_id ORDER BY turn_idx) AS dst
        |  FROM c),
        |fn AS (
        |  SELECT conv_id,
        |         conv_id || ':0-' || CAST(LENGTH(text) AS VARCHAR) AS fullnode
        |  FROM turns
        |  WHERE turn_idx = 0 AND (conv_id LIKE 'c0d%' OR conv_id LIKE 'c1d%')),
        |l AS (
        |  SELECT fullnode AS src,
        |         LEAD(fullnode) OVER (PARTITION BY substr(conv_id, 1, 2)
        |                              ORDER BY conv_id) AS dst
        |  FROM fn)
        |SELECT src, dst, '+' AS from_orient, '+' AS to_orient, k.kind
        |FROM p, (VALUES ('edge'), ('chain')) AS k(kind)
        |WHERE dst IS NOT NULL
        |UNION ALL
        |-- the C containment per multi-turn conversation rewires to the
        |-- same (full-span, second-interval) pair as the first E record
        |SELECT src, dst, '+', '+', 'edge' FROM p
        |WHERE turn_idx = 0 AND dst IS NOT NULL
        |UNION ALL
        |SELECT src, dst, '+', '+', 'link' FROM l WHERE dst IS NOT NULL""".stripMargin),
    "q_split_rejects" -> tsql(
      """SELECT COUNT(DISTINCT conv_id) AS n_rejected
        |FROM turns WHERE conv_id LIKE 'c0d%' OR conv_id LIKE 'c1d%'""".stripMargin),
    "q_gfa_bytes" -> tsql(
      """SELECT CAST(SUM(LENGTH(text)) AS BIGINT) AS seq_bytes_total,
        |       CAST(SUM(2 + LENGTH(CAST(LENGTH(text) AS VARCHAR))) AS BIGINT)
        |         AS tags_bytes_total
        |FROM turns""".stripMargin),
    "q_gfa_malformed" -> tsql(
      """SELECT 'L' AS rtype, COUNT(DISTINCT conv_id) AS n_records
        |FROM turns HAVING COUNT(DISTINCT conv_id) > 0""".stripMargin),
    "q_gfa_bidir" -> tsql(
      """, p AS (
        |  SELECT conv_id, turn_idx AS k, LEAD(turn_idx) OVER w AS k2
        |  FROM turns WHERE regexp_matches(conv_id, '^c[0-9]d')
        |  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
        |  QUALIFY LEAD(turn_idx) OVER w IS NOT NULL)
        |SELECT conv_id || ':' || CAST(k AS VARCHAR) || ':' ||
        |         CASE WHEN k % 2 = 0 THEN '+' ELSE '-' END AS src,
        |       conv_id || ':' || CAST(k2 AS VARCHAR) || ':' ||
        |         CASE WHEN k2 % 2 = 0 THEN '+' ELSE '-' END AS dst
        |FROM p
        |UNION ALL
        |SELECT conv_id || ':' || CAST(k2 AS VARCHAR) || ':' ||
        |         CASE WHEN k2 % 2 = 0 THEN '-' ELSE '+' END,
        |       conv_id || ':' || CAST(k AS VARCHAR) || ':' ||
        |         CASE WHEN k % 2 = 0 THEN '-' ELSE '+' END
        |FROM p""".stripMargin),
    "q_gfa_paths" -> tsql(
      """SELECT conv_id AS name, turn_idx AS pos,
        |       conv_id || ':' || CAST(turn_idx AS VARCHAR) AS seg,
        |       CASE WHEN role = 'user' THEN '+' ELSE '-' END AS ori
        |FROM turns""".stripMargin),
    "q_gfa_stats" -> tsql(
      """, e AS (
        |  SELECT date_diff('microsecond', ts, LEAD(ts) OVER w) AS gap_us
        |  FROM turns WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
        |  QUALIFY LEAD(turn_idx) OVER w IS NOT NULL)
        |SELECT (SELECT COUNT(*) FROM turns) AS n_segments,
        |       (SELECT CAST(SUM(LENGTH(text)) AS BIGINT) FROM turns) AS seq_bytes,
        |       COUNT(*) AS n_links,
        |       CAST(SUM(gap_us) AS DOUBLE) AS total_weight
        |FROM e""".stripMargin),
    "q_dist_matrix" -> Transcripts.sqlRecursive(overlapCte +
      """,
        |walk AS (
        |  SELECT conv_id AS src, conv_id AS node, CAST(0 AS BIGINT) AS dist
        |  FROM (SELECT DISTINCT conv_id FROM ct)
        |  UNION
        |  SELECT walk.src, e.dst, walk.dist + 1
        |  FROM walk JOIN e ON walk.node = e.src WHERE walk.dist < 512
        |)
        |SELECT src AS tag_a, node AS tag_b, MIN(dist) AS dist
        |FROM walk GROUP BY 1, 2""".stripMargin),
    "q_dist_matrix_mean" -> Transcripts.sqlRecursive(overlapCte +
      """,
        |g AS (SELECT conv_id AS node,
        |             CASE WHEN conv_id LIKE 'c0d%' THEN 'g0' ELSE 'g1' END AS tag
        |      FROM (SELECT DISTINCT conv_id FROM ct)),
        |walk AS (
        |  SELECT tag AS src_tag, node, CAST(0 AS BIGINT) AS dist FROM g
        |  UNION
        |  SELECT walk.src_tag, e.dst, walk.dist + 1
        |  FROM walk JOIN e ON walk.node = e.src WHERE walk.dist < 512
        |),
        |dg AS (SELECT src_tag, node, MIN(dist) AS dist FROM walk GROUP BY 1, 2),
        |x AS (SELECT LEAST(gs.tag, dg.src_tag) AS tag_a,
        |             GREATEST(gs.tag, dg.src_tag) AS tag_b,
        |             CAST(dg.dist AS DOUBLE) AS dist
        |      FROM dg JOIN g gs ON dg.node = gs.node
        |      WHERE gs.tag <> dg.src_tag),
        |m AS (SELECT tag_a, tag_b, AVG(dist) AS dist FROM x GROUP BY 1, 2),
        |sym AS (SELECT tag_a, tag_b, dist FROM m
        |        UNION ALL SELECT tag_b AS tag_a, tag_a AS tag_b, dist FROM m),
        |diag AS (SELECT DISTINCT tag AS tag_a, tag AS tag_b, 0.0 AS dist FROM g)
        |SELECT tag_a, tag_b, dist FROM sym
        |UNION ALL SELECT tag_a, tag_b, dist FROM diag""".stripMargin),
    // frame sampling is integer byte arithmetic over the payload — the
    // plumbing half of the multimodal stack is exactly checkable even
    // though the decode kernel itself is a declared stub
    "q_mm_frames" ->
      """SELECT media_id, COUNT(*) AS n_frames,
        |       CAST(SUM(LEAST(256, len - i*256)) AS BIGINT) AS bytes_kept
        |FROM (SELECT doc_id AS media_id, octet_length(encode(text)) AS len,
        |             GREATEST(CAST(CEIL(octet_length(encode(text)) / 256.0) AS INTEGER), 1) AS nf
        |      FROM documents) d,
        |     UNNEST(generate_series(0, CAST(d.nf AS BIGINT) - 1)) AS t(i)
        |WHERE i % 2 = 0
        |GROUP BY 1""".stripMargin,
    // feature extraction over the stub decode IS byte arithmetic: block 0
    // of decodeStub = mean of the first max(1, len/16) payload bytes; the
    // documents text is ASCII (verified: octet_length == length corpus-
    // wide), so ascii(substr(...)) reads the exact byte values, and
    // REAL/REAL division is the correctly rounded float quotient both
    // engines produce for small exact integers
    "q_mm_features" ->
      """SELECT media_id, CAST(16 AS INTEGER) AS dim,
        |       CAST(CAST(s AS REAL) / CAST(blk AS REAL) AS REAL) AS f0
        |FROM (
        |  SELECT media_id, blk,
        |         SUM(ascii(substr(text, CAST(i AS INTEGER), 1))) AS s
        |  FROM (SELECT doc_id AS media_id, text,
        |               GREATEST(octet_length(encode(text)) // 16, 1) AS blk
        |        FROM documents) b,
        |       UNNEST(generate_series(1, CAST(b.blk AS BIGINT))) AS t(i)
        |  GROUP BY 1, 2)""".stripMargin,
    "q_doc_dedup" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |       COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
        |FROM documents GROUP BY 1""".stripMargin,
    "q_stream_dedup_inc" ->
      """WITH src AS (
        |  SELECT d.doc_id,
        |         CASE WHEN d.doc_id % 7 = 3 THEN b.text
        |              WHEN d.doc_id >= 100 AND d.doc_id % 9 = 7 THEN p.text
        |              ELSE d.text END AS text
        |  FROM documents d
        |  LEFT JOIN documents b ON b.doc_id = d.doc_id + 200
        |  LEFT JOIN documents p ON p.doc_id = d.doc_id - 100
        |  WHERE d.doc_id < 200),
        |f AS (SELECT doc_id,
        |             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |               AS fp
        |      FROM src),
        |base AS (SELECT DISTINCT
        |           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |             AS fp
        |         FROM documents WHERE doc_id >= 200)
        |SELECT MIN(doc_id) AS doc_id, fp
        |FROM f WHERE fp NOT IN (SELECT fp FROM base)
        |GROUP BY fp""".stripMargin,
    "q_doc_quality" ->
      """SELECT doc_id, n_tokens, n_alpha, n_digits, n_punct, n_stopwords,
        |       (n_tokens >= 5 AND n_chars_m <= n_tokens * 20
        |        AND n_stopwords * 50 >= n_tokens) AS is_quality
        |FROM (
        |  SELECT doc_id,
        |         CAST(LENGTH(text) AS INTEGER) AS n_chars_m,
        |         CAST(len(regexp_extract_all(text, '\S+')) AS INTEGER) AS n_tokens,
        |         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS INTEGER) AS n_alpha,
        |         CAST(len(regexp_extract_all(text, '[0-9]')) AS INTEGER) AS n_digits,
        |         CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS INTEGER) AS n_punct,
        |         CAST(len(regexp_extract_all(lower(text),
        |           '\b(the|a|an|and|of|to|in|is|it|that|for|on|with|as)\b')) AS INTEGER) AS n_stopwords
        |  FROM documents)""".stripMargin,
    "q_doc_tokens" ->
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(text, '\S+')) AS INTEGER) AS ws_tokens,
        |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS INTEGER) AS bpe_tokens
        |FROM documents""".stripMargin,
    // word-8-gram decontamination: tokens via indexed list access (DuckDB
    // has no WITH ORDINALITY), grams via the same pos-ascending sliding
    // frame the Spark window uses; benchmark slice = doc_id % 10 = 7
    "q_decontam" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tok AS (
        |  SELECT doc_id, CAST(t.i - 1 AS INTEGER) AS pos,
        |         toks[CAST(t.i AS INTEGER)] AS w
        |  FROM d, UNNEST(generate_series(1, CAST(len(toks) AS BIGINT))) AS t(i)),
        |g AS (
        |  SELECT doc_id, pos,
        |         string_agg(w, ' ') OVER (PARTITION BY doc_id ORDER BY pos
        |           ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS gram,
        |         COUNT(*) OVER (PARTITION BY doc_id) AS n
        |  FROM tok),
        |gr AS (SELECT DISTINCT doc_id, gram FROM g WHERE pos <= n - 8)
        |SELECT t.doc_id,
        |       CAST(COUNT(DISTINCT t.gram) AS BIGINT) AS n_hits,
        |       CAST(COUNT(DISTINCT b.doc_id) AS BIGINT) AS n_bench_docs
        |FROM gr t JOIN gr b ON t.gram = b.gram
        |WHERE t.doc_id % 10 <> 7 AND b.doc_id % 10 = 7
        |GROUP BY 1""".stripMargin,
    // exactly-stratified split: md5 over the decimal-rendered id is
    // byte-identical in both engines, so the per-stratum rank agrees
    "q_train_split" ->
      """SELECT doc_id, lang, source, rn, n_stratum,
        |       CASE WHEN rn * 10 <= n_stratum * 1 THEN 'val' ELSE 'train' END AS split
        |FROM (
        |  SELECT doc_id, lang, source,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY lang, source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rn,
        |         COUNT(*) OVER (PARTITION BY lang, source) AS n_stratum
        |  FROM documents)""".stripMargin,
    "q_doc_repetition" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tok AS (
        |  SELECT doc_id, CAST(t.i - 1 AS INTEGER) AS pos,
        |         toks[CAST(t.i AS INTEGER)] AS w
        |  FROM d, UNNEST(generate_series(1, CAST(len(toks) AS BIGINT))) AS t(i)),
        |stats AS (
        |  SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_tokens,
        |         CAST(COUNT(DISTINCT w) AS INTEGER) AS n_distinct_tokens
        |  FROM tok GROUP BY 1),
        |bg AS (
        |  SELECT doc_id, w || ' ' ||
        |         LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
        |  FROM tok),
        |bgc AS (SELECT doc_id, bigram, COUNT(*) AS n FROM bg
        |        WHERE bigram IS NOT NULL GROUP BY 1, 2),
        |top AS (SELECT doc_id, CAST(SUM(n) AS INTEGER) AS n_bigrams,
        |               CAST(MAX(n) AS INTEGER) AS top_bigram_n
        |        FROM bgc GROUP BY 1)
        |SELECT s.doc_id, s.n_tokens, s.n_distinct_tokens,
        |       COALESCE(t.n_bigrams, 0) AS n_bigrams,
        |       COALESCE(t.top_bigram_n, 0) AS top_bigram_n,
        |       COALESCE(t.top_bigram_n, 0) * 5 > COALESCE(t.n_bigrams, 0)
        |         AS is_repetitive
        |FROM stats s LEFT JOIN top t ON s.doc_id = t.doc_id""".stripMargin,
    "q_mix_epochs" ->
      """WITH perSrc AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |         CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
        |           AS n_tokens
        |  FROM documents GROUP BY 1),
        |m AS (SELECT *, MAX(n_tokens) OVER () AS max_tokens FROM perSrc)
        |SELECT source, n_docs, n_tokens,
        |       CAST(LEAST((max_tokens + n_tokens - 1) // n_tokens, 4)
        |            AS INTEGER) AS epochs,
        |       CAST(LEAST((max_tokens + n_tokens - 1) // n_tokens, 4)
        |            * n_tokens AS BIGINT) AS weighted_tokens
        |FROM m""".stripMargin,
    // context-length chunking: chunk k of doc d = tokens [k*48, k*48+64)
    // for every k*48 < n; DuckDB's 1-based inclusive list_slice mirrors
    // Spark's slice(arr, start, length)
    "q_doc_chunks" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |c AS (SELECT doc_id, toks, CAST(len(toks) AS INTEGER) AS n,
        |             CAST(k.i AS INTEGER) AS chunk_idx
        |      FROM d, UNNEST(generate_series(0,
        |             CAST((len(toks) - 1) // 48 AS BIGINT))) AS k(i))
        |SELECT doc_id, chunk_idx,
        |       array_to_string(list_slice(toks, chunk_idx * 48 + 1,
        |                                  LEAST(chunk_idx * 48 + 64, n)), ' ')
        |         AS chunk_text,
        |       CAST(LEAST(64, n - chunk_idx * 48) AS INTEGER) AS n_chunk_tokens
        |FROM c""".stripMargin,
    // mixture application: epochs(source) recomputed as in q_mix_epochs,
    // then one row per (doc, epoch) via a lateral series
    "q_mix_apply" ->
      """WITH perSrc AS (
        |  SELECT source,
        |         CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
        |           AS n_tokens
        |  FROM documents GROUP BY 1),
        |m AS (SELECT source,
        |             CAST(LEAST((MAX(n_tokens) OVER () + n_tokens - 1)
        |                  // n_tokens, 4) AS INTEGER) AS epochs
        |      FROM perSrc)
        |SELECT d.doc_id, d.source, CAST(e.i AS INTEGER) AS epoch
        |FROM documents d JOIN m USING (source),
        |     UNNEST(generate_series(1, CAST(m.epochs AS BIGINT))) AS e(i)""".stripMargin,
    // sequence packing: the oracle computes the SAME offsets with the
    // naive single global window — the two-phase bucketed sum must agree
    "q_pack_offsets" ->
      """WITH d AS (SELECT doc_id,
        |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |           FROM documents),
        |o AS (SELECT doc_id, n_tokens,
        |             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |               AS BIGINT) AS tok_offset
        |      FROM d)
        |SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens, tok_offset,
        |       CAST(tok_offset // 256 AS INTEGER) AS seq_first,
        |       CAST((tok_offset + n_tokens - 1) // 256 AS INTEGER) AS seq_last
        |FROM o""".stripMargin,
    // corpus bigram top-5 per source: grams via the same pos-ascending
    // sliding string_agg frame as q_decontam; integer counts + the
    // ngram-string tie-break make the top-k row set deterministic
    "q_ngram_counts" ->
      """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS toks
        |           FROM documents),
        |tok AS (SELECT doc_id, source, CAST(t.i - 1 AS INTEGER) AS pos,
        |               toks[CAST(t.i AS INTEGER)] AS w
        |        FROM d, UNNEST(generate_series(1, CAST(len(toks) AS BIGINT))) AS t(i)),
        |g AS (SELECT doc_id, source, pos,
        |             string_agg(w, ' ') OVER (PARTITION BY doc_id ORDER BY pos
        |               ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING) AS ngram,
        |             COUNT(*) OVER (PARTITION BY doc_id) AS ntok
        |      FROM tok),
        |c AS (SELECT source, ngram, CAST(COUNT(*) AS BIGINT) AS n_occ,
        |             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        |      FROM g WHERE pos <= ntok - 2 GROUP BY 1, 2)
        |SELECT source, ngram, n_occ, n_docs, rank FROM (
        |  SELECT source, ngram, n_occ, n_docs,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY source
        |           ORDER BY n_occ DESC, ngram) AS INTEGER) AS rank
        |  FROM c) WHERE rank <= 5""".stripMargin,
    // heavy hitters in the exact regime (distinct ≤ capacity): the MG
    // sketch must equal the plain count
    "q_heavy_terms" ->
      """SELECT source, w AS term, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |      FROM documents)
        |GROUP BY 1, 2""".stripMargin,
    // line dedup: the oracle re-derives the 8-token line segmentation
    // straight from the raw text with list slicing (no newline fixture
    // materialized anywhere), then takes first occurrence per distinct
    // line with the row_number window — semantically identical to the
    // engine's skew-safe min(struct) group-by
    "q_line_dedup" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t
        |            FROM documents),
        |lines AS (
        |  SELECT doc_id, g AS line_idx,
        |         array_to_string(t[g*8+1 : g*8+8], ' ') AS line
        |  FROM tk, unnest(range(CAST((len(t)+7)//8 AS BIGINT))) AS u(g)),
        |flagged AS (
        |  SELECT doc_id, line_idx, line,
        |         row_number() OVER (PARTITION BY md5(line)
        |                            ORDER BY doc_id, line_idx) = 1 AS keep
        |  FROM lines)
        |SELECT doc_id,
        |       CAST(count(*) AS INTEGER) AS n_lines,
        |       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS INTEGER)
        |         AS kept_lines,
        |       COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10)
        |                           ORDER BY line_idx), '') AS text
        |FROM flagged
        |GROUP BY doc_id""".stripMargin,
    // token-budget selection: DuckDB runs the NAIVE global-window form of
    // the same prefix sum (fine at oracle scale; the engine's banded
    // two-phase form must produce identical integers)
    "q_token_budget" ->
      """WITH s2 AS (
        |  SELECT doc_id,
        |         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
        |           AS n_tokens,
        |         (CAST(len(regexp_extract_all(lower(text),
        |            '\b(the|a|an|and|of|to|in|is|it|that|for|on|with|as)\b'))
        |            AS BIGINT) * 1000000)
        |           // greatest(CAST(len(regexp_extract_all(text, '\S+'))
        |                           AS BIGINT), 1) AS score_ppm
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, score_ppm, n_tokens,
        |         CAST(COALESCE(SUM(n_tokens) OVER (
        |           ORDER BY score_ppm DESC, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS cum_before
        |  FROM s2)
        |SELECT doc_id, score_ppm, n_tokens, cum_before,
        |       cum_before < (SELECT (SUM(n_tokens) * 2) // 5 FROM s2)
        |         AS selected
        |FROM c""".stripMargin,
    // PII redaction: the oracle does NOT run a regex — it reconstructs
    // the expected redacted text and per-class counts directly from the
    // deterministic doc_id-arithmetic plants ([[piiDocs]]), so the
    // compare certifies the Spark regexes match exactly the planted
    // tokens (an over-match eats base text, an under-match leaves a raw
    // plant — both break the hash)
    "q_doc_redact" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 5 = 2 THEN 'call <PHONE> ' ELSE '' END
        |         || text
        |         || CASE WHEN doc_id % 3 = 0 THEN ' reach <EMAIL>'
        |              || CASE WHEN doc_id % 9 = 0 THEN ' and <EMAIL>' ELSE '' END
        |            ELSE '' END
        |         || CASE WHEN doc_id % 4 = 1 THEN ' ssn <SSN>' ELSE '' END
        |         AS redacted,
        |       CAST(CASE WHEN doc_id % 3 = 0 THEN
        |              CASE WHEN doc_id % 9 = 0 THEN 2 ELSE 1 END
        |            ELSE 0 END AS INTEGER) AS n_email,
        |       CAST(CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END AS INTEGER) AS n_ssn,
        |       CAST(CASE WHEN doc_id % 5 = 2 THEN 1 ELSE 0 END AS INTEGER) AS n_phone,
        |       CAST(CASE WHEN doc_id % 3 = 0 THEN
        |              CASE WHEN doc_id % 9 = 0 THEN 2 ELSE 1 END
        |            ELSE 0 END
        |          + CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END
        |          + CASE WHEN doc_id % 5 = 2 THEN 1 ELSE 0 END AS INTEGER) AS n_pii
        |FROM documents""".stripMargin,
    "q_stream_redact" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 5 = 2 THEN 'call <PHONE> ' ELSE '' END
        |         || text
        |         || CASE WHEN doc_id % 3 = 0 THEN ' reach <EMAIL>'
        |              || CASE WHEN doc_id % 9 = 0 THEN ' and <EMAIL>' ELSE '' END
        |            ELSE '' END
        |         || CASE WHEN doc_id % 4 = 1 THEN ' ssn <SSN>' ELSE '' END
        |         AS redacted,
        |       CAST(CASE WHEN doc_id % 3 = 0 THEN
        |              CASE WHEN doc_id % 9 = 0 THEN 2 ELSE 1 END
        |            ELSE 0 END AS INTEGER) AS n_email,
        |       CAST(CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END AS INTEGER) AS n_ssn,
        |       CAST(CASE WHEN doc_id % 5 = 2 THEN 1 ELSE 0 END AS INTEGER) AS n_phone,
        |       CAST(CASE WHEN doc_id % 3 = 0 THEN
        |              CASE WHEN doc_id % 9 = 0 THEN 2 ELSE 1 END
        |            ELSE 0 END
        |          + CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END
        |          + CASE WHEN doc_id % 5 = 2 THEN 1 ELSE 0 END AS INTEGER) AS n_pii
        |FROM documents WHERE doc_id < 200""".stripMargin,
    "q_redact_counts" ->
      """WITH n AS (
        |  SELECT CASE WHEN doc_id % 3 = 0 THEN
        |           CASE WHEN doc_id % 9 = 0 THEN 2 ELSE 1 END
        |         ELSE 0 END AS n_email,
        |         CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END AS n_ssn,
        |         CASE WHEN doc_id % 5 = 2 THEN 1 ELSE 0 END AS n_phone
        |  FROM documents)
        |SELECT 'email' AS class, CAST(SUM(n_email) AS BIGINT) AS n_matches,
        |       CAST(SUM(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs
        |FROM n
        |UNION ALL
        |SELECT 'ssn', CAST(SUM(n_ssn) AS BIGINT),
        |       CAST(SUM(CASE WHEN n_ssn > 0 THEN 1 ELSE 0 END) AS BIGINT) FROM n
        |UNION ALL
        |SELECT 'phone', CAST(SUM(n_phone) AS BIGINT),
        |       CAST(SUM(CASE WHEN n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT) FROM n""".stripMargin,
    // TF-IDF keywords: tf over exploded whitespace terms, df over the
    // distinct (doc, term) pairs, ppm integer-division score, top-3 per
    // doc with the term tie-break
    "q_tfidf_keywords" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |t AS (SELECT doc_id, toks[CAST(i.i AS INTEGER)] AS term
        |      FROM d, UNNEST(generate_series(1, CAST(len(toks) AS BIGINT))) AS i(i)),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM t GROUP BY 1, 2),
        |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
        |       FROM tf GROUP BY 1),
        |s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |             CAST(tf.tf * 1000000 // df.df AS BIGINT) AS score_ppm
        |      FROM tf JOIN df USING (term))
        |SELECT doc_id, term, tf, df, score_ppm, rank FROM (
        |  SELECT doc_id, term, tf, df, score_ppm,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
        |           ORDER BY score_ppm DESC, term) AS INTEGER) AS rank
        |  FROM s) WHERE rank <= 3""".stripMargin,
    "q_doc_lang" ->
      """SELECT doc_id, lang,
        |       CASE WHEN CAST(len(regexp_extract_all(lower(text),
        |                 '\b(the|a|an|and|of|to|in|is|it|that|for|on|with|as)\b')) AS INTEGER) * 25
        |                 >= CAST(len(regexp_extract_all(text, '\S+')) AS INTEGER)
        |            THEN 'en' ELSE 'unk' END AS pred_lang
        |FROM documents""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty,
        |       COUNT(*) AS count_order, COUNT(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q_mkt_orders" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |       COUNT(DISTINCT o_custkey) AS n_custs
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,
    // brute cosine top-k IS SQL-expressible: double-cast list_dot_product
    // matches FloatVecDot's float→double accumulation, and ranking on
    // round(sim, 6) + id tie-break removes cross-engine FP order effects.
    // NaN note: the engine DROPS NaN sims (zero-norm vectors) uniformly
    // across brute/LSH/IVF, while this SQL would sort NaN first — the
    // embeddings table is unit-normalized, so no NaN can occur here; a
    // corpus with zero-norm vectors must be filtered before kNN.
    "q_knn_brute" ->
      """SELECT query_id, nbr_id, rank FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS nbr_id,
        |         CAST(ROW_NUMBER() OVER (
        |           PARTITION BY q.vec_id
        |           ORDER BY round(
        |             list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
        |             (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
        |              sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 6) DESC,
        |             c.vec_id ASC) AS INTEGER) AS rank
        |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id)
        |WHERE rank <= 5""".stripMargin,

    // --- post-hash oracles: the xxhash64 signature stages cannot be
    // reproduced in DuckDB, but the queries materialize them to
    // deterministic per-sf parquet ([[graft.ops.OracleSig]]) and compute
    // their results FROM the written tables — so the oracle reads the
    // same bytes (multi-tag glob filtered by the corpus fingerprint each
    // row was stamped with, making the compare exact at EVERY sf) and
    // recomputes the entire post-hash pipeline (banding joins, caps,
    // hamming/jaccard/cosine verification, winnowing, ranking)
    // independently. The hash stages stay pinned by planted fixtures
    // (DedupSpec / KnnSpec).
    "q_doc_fingerprints" ->
      s"""WITH g AS (SELECT doc_id, pos, h
         |           FROM read_parquet('${sigGlob("fp_grams")}')
         |           WHERE corpus_fp = $docsFpSql),
         |w AS (SELECT doc_id, pos,
         |        MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
         |                     ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
         |        COUNT(*) OVER (PARTITION BY doc_id) AS n
         |      FROM g),
         |f AS (SELECT doc_id, COUNT(DISTINCT wmin) AS n_fp FROM w
         |      WHERE pos <= GREATEST(n - 4, 0) GROUP BY doc_id)
         |SELECT d.doc_id, CAST(COALESCE(f.n_fp, 0) AS INTEGER) AS n_fp
         |FROM documents d LEFT JOIN f ON d.doc_id = f.doc_id""".stripMargin,
    "q_minhash_neardups" ->
      s"""WITH b AS (SELECT id, band, band_hash
         |           FROM read_parquet('${sigGlob("mh_bands")}')
         |           WHERE corpus_fp = $docsFpSql
         |           QUALIFY COUNT(*) OVER (PARTITION BY band, band_hash)
         |                   <= ${Dedup.DefaultMaxBucket}),
         |cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
         |         FROM b x JOIN b y
         |           ON x.band = y.band AND x.band_hash = y.band_hash
         |         WHERE x.id < y.id),
         |sh AS (SELECT id, sh FROM read_parquet('${sigGlob("mh_sh")}')
         |       WHERE corpus_fp = $docsFpSql),
         |v AS (SELECT id_a, id_b,
         |        CAST(len(list_intersect(a.sh, c.sh)) AS DOUBLE) /
         |        (len(a.sh) + len(c.sh) - len(list_intersect(a.sh, c.sh)))
         |          AS jaccard
         |      FROM cand JOIN sh a ON a.id = id_a JOIN sh c ON c.id = id_b)
         |SELECT id_a, id_b, jaccard FROM v
         |ORDER BY jaccard DESC, id_a, id_b LIMIT 200""".stripMargin,
    // incremental near-dup: the batch pair pipeline (cap + banding join +
    // jaccard verify over the SAME materialized signatures) thresholded
    // at 0.5 and restricted to pairs with a streamed endpoint (doc_id <
    // 200) — base×base pairs are exactly the ones the incremental pass
    // must never emit. Bucket-cap note: the incremental cap is evaluated
    // on the corpus-so-far; it coincides with this full-corpus QUALIFY
    // whenever no bucket crosses the cap mid-stream (always true at test
    // scale — max bucket ≪ 10⁴).
    "q_stream_neardup" ->
      s"""WITH b AS (SELECT id, band, band_hash
         |           FROM read_parquet('${sigGlob("mh_bands")}')
         |           WHERE corpus_fp = $docsFpSql
         |           QUALIFY COUNT(*) OVER (PARTITION BY band, band_hash)
         |                   <= ${Dedup.DefaultMaxBucket}),
         |cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
         |         FROM b x JOIN b y
         |           ON x.band = y.band AND x.band_hash = y.band_hash
         |         WHERE x.id < y.id),
         |sh AS (SELECT id, sh FROM read_parquet('${sigGlob("mh_sh")}')
         |       WHERE corpus_fp = $docsFpSql),
         |v AS (SELECT id_a, id_b,
         |        CAST(len(list_intersect(a.sh, c.sh)) AS DOUBLE) /
         |        (len(a.sh) + len(c.sh) - len(list_intersect(a.sh, c.sh)))
         |          AS jaccard
         |      FROM cand JOIN sh a ON a.id = id_a JOIN sh c ON c.id = id_b)
         |SELECT id_a, id_b, jaccard FROM v
         |WHERE jaccard >= 0.5 AND (id_a < 200 OR id_b < 200)""".stripMargin,
    // q_minhash_neardups' pair pipeline (same materialized signatures,
    // thresholded instead of ranked) + a recursive min-label clustering
    // and the keeper/bytes-saved rollup
    "q_dup_clusters" ->
      s"""WITH RECURSIVE b AS (SELECT id, band, band_hash
         |           FROM read_parquet('${sigGlob("mh_bands")}')
         |           WHERE corpus_fp = $docsFpSql
         |           QUALIFY COUNT(*) OVER (PARTITION BY band, band_hash)
         |                   <= ${Dedup.DefaultMaxBucket}),
         |cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
         |         FROM b x JOIN b y
         |           ON x.band = y.band AND x.band_hash = y.band_hash
         |         WHERE x.id < y.id),
         |sh AS (SELECT id, sh FROM read_parquet('${sigGlob("mh_sh")}')
         |       WHERE corpus_fp = $docsFpSql),
         |p AS (SELECT id_a, id_b FROM (
         |        SELECT id_a, id_b,
         |          CAST(len(list_intersect(a.sh, c.sh)) AS DOUBLE) /
         |          (len(a.sh) + len(c.sh) - len(list_intersect(a.sh, c.sh)))
         |            AS jaccard
         |        FROM cand JOIN sh a ON a.id = id_a JOIN sh c ON c.id = id_b)
         |      WHERE jaccard >= 0.5),
         |e AS (SELECT id_a AS src, id_b AS dst FROM p
         |      UNION SELECT id_b AS src, id_a AS dst FROM p),
         |reach AS (
         |  SELECT src AS node, src AS r FROM e
         |  UNION
         |  SELECT reach.node, e.dst FROM reach JOIN e ON reach.r = e.src
         |),
         |lab AS (SELECT node AS doc_id, MIN(r) AS cluster_id
         |        FROM reach GROUP BY node),
         |sized AS (SELECT cluster_id, lab.doc_id,
         |                 octet_length(encode(text)) AS n_bytes
         |          FROM lab JOIN documents USING (doc_id)),
         |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
         |             ORDER BY n_bytes DESC, doc_id ASC) AS rn FROM sized)
         |SELECT cluster_id, COUNT(*) AS n_docs,
         |       MAX(CASE WHEN rn = 1 THEN doc_id END) AS keep_id,
         |       CAST(SUM(n_bytes) - MAX(n_bytes) AS BIGINT) AS dup_bytes
         |FROM ranked GROUP BY cluster_id""".stripMargin,
    // the whole funnel recomputed independently: per-doc lang/quality
    // flags and the exact-dedup keeper window in SQL, near-dup drops via
    // the q_dup_clusters pair pipeline restricted to exact-stage
    // survivors, then one UNION ALL row per stage
    "q_corpus_filter" ->
      s"""WITH RECURSIVE base AS (
         |  SELECT doc_id, text, octet_length(encode(text)) AS n_bytes,
         |         CAST(len(regexp_extract_all(text, '\\S+')) AS INTEGER)
         |           AS n_tokens,
         |         CAST(len(regexp_extract_all(lower(text),
         |           '\\b(the|a|an|and|of|to|in|is|it|that|for|on|with|as)\\b'))
         |           AS INTEGER) AS n_stop
         |  FROM documents),
         |flags AS (
         |  SELECT doc_id, n_bytes,
         |         (n_stop * 25 >= n_tokens) AS ok_lang,
         |         (n_tokens >= 5 AND LENGTH(text) <= n_tokens * 20
         |          AND n_stop * 50 >= n_tokens) AS ok_quality,
         |         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
         |           AS fp
         |  FROM base),
         |lg AS (SELECT doc_id, n_bytes FROM flags WHERE ok_lang),
         |lq AS (SELECT doc_id, n_bytes, fp FROM flags
         |       WHERE ok_lang AND ok_quality),
         |ex AS (SELECT doc_id, n_bytes FROM lq
         |       QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY fp)),
         |b AS (SELECT id, band, band_hash
         |      FROM read_parquet('${sigGlob("mh_bands")}')
         |      WHERE corpus_fp = $docsFpSql
         |      QUALIFY COUNT(*) OVER (PARTITION BY band, band_hash)
         |              <= ${Dedup.DefaultMaxBucket}),
         |cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
         |         FROM b x JOIN b y
         |           ON x.band = y.band AND x.band_hash = y.band_hash
         |         WHERE x.id < y.id),
         |sh AS (SELECT id, sh FROM read_parquet('${sigGlob("mh_sh")}')
         |       WHERE corpus_fp = $docsFpSql),
         |p AS (SELECT id_a, id_b FROM (
         |        SELECT id_a, id_b,
         |          CAST(len(list_intersect(a.sh, c.sh)) AS DOUBLE) /
         |          (len(a.sh) + len(c.sh) - len(list_intersect(a.sh, c.sh)))
         |            AS jaccard
         |        FROM cand JOIN sh a ON a.id = id_a JOIN sh c ON c.id = id_b)
         |      WHERE jaccard >= 0.5),
         |pr AS (SELECT id_a, id_b FROM p
         |       WHERE id_a IN (SELECT doc_id FROM ex)
         |         AND id_b IN (SELECT doc_id FROM ex)),
         |e AS (SELECT id_a AS src, id_b AS dst FROM pr
         |      UNION SELECT id_b AS src, id_a AS dst FROM pr),
         |reach AS (
         |  SELECT src AS node, src AS r FROM e
         |  UNION
         |  SELECT reach.node, e.dst FROM reach JOIN e ON reach.r = e.src
         |),
         |lab AS (SELECT node AS doc_id, MIN(r) AS cluster_id
         |        FROM reach GROUP BY node),
         |mem AS (SELECT lab.doc_id, cluster_id, flags.n_bytes
         |        FROM lab JOIN flags USING (doc_id)),
         |drops AS (SELECT doc_id FROM (
         |            SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY
         |              cluster_id ORDER BY n_bytes DESC, doc_id ASC) AS rn
         |            FROM mem)
         |          WHERE rn > 1),
         |nd AS (SELECT doc_id, n_bytes FROM ex
         |       WHERE doc_id NOT IN (SELECT doc_id FROM drops))
         |SELECT * FROM (
         |  SELECT 0 AS stage_idx, 'total' AS stage, COUNT(*) AS n_docs,
         |         CAST(SUM(n_bytes) AS BIGINT) AS n_bytes FROM base
         |  UNION ALL SELECT 1, 'lang', COUNT(*),
         |         CAST(SUM(n_bytes) AS BIGINT) FROM lg
         |  UNION ALL SELECT 2, 'quality', COUNT(*),
         |         CAST(SUM(n_bytes) AS BIGINT) FROM lq
         |  UNION ALL SELECT 3, 'exact_dedup', COUNT(*),
         |         CAST(SUM(n_bytes) AS BIGINT) FROM ex
         |  UNION ALL SELECT 4, 'near_dedup', COUNT(*),
         |         CAST(SUM(n_bytes) AS BIGINT) FROM nd)""".stripMargin,
    "q_simhash_neardups" ->
      s"""WITH s AS (SELECT id, simhash
         |           FROM read_parquet('${sigGlob("sim_sigs")}')
         |           WHERE corpus_fp = $docsFpSql),
         |c AS (SELECT id, simhash, ci AS chunk,
         |             (simhash >> (ci * 16)) & 65535 AS chunk_val
         |      FROM s, UNNEST(generate_series(0, 3)) AS t(ci)
         |      QUALIFY COUNT(*) OVER (PARTITION BY chunk, chunk_val)
         |              <= ${Dedup.DefaultMaxBucket}),
         |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         |                CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER)
         |                  AS hamming
         |         FROM c a JOIN c b
         |           ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val
         |         WHERE a.id < b.id)
         |SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 16""".stripMargin,
    "q_knn_lsh" ->
      s"""WITH sig AS (SELECT id, sig
         |             FROM read_parquet('${sigGlob("vec_sigs")}')
         |             WHERE corpus_fp = $embFpSql),
         |ch AS (SELECT id, ci AS chunk, (sig >> (ci * 8)) & 255 AS chunk_val
         |       FROM sig, UNNEST(generate_series(0, 3)) AS t(ci)),
         |corp AS (SELECT id, chunk, chunk_val FROM ch
         |         QUALIFY COUNT(*) OVER (PARTITION BY chunk, chunk_val)
         |                 <= ${Dedup.DefaultMaxBucket}),
         |cand AS (SELECT DISTINCT q.id AS query_id, c.id AS nbr_id
         |         FROM corp c JOIN ch q
         |           ON c.chunk = q.chunk AND c.chunk_val = q.chunk_val
         |         WHERE q.id <> c.id),
         |scored AS (SELECT cand.query_id, cand.nbr_id,
         |             list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
         |             (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
         |              sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS sim
         |           FROM cand JOIN embeddings q ON q.vec_id = cand.query_id
         |                     JOIN embeddings c ON c.vec_id = cand.nbr_id)
         |SELECT query_id, nbr_id, rank FROM (
         |  SELECT query_id, nbr_id,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY round(sim, 6) DESC, nbr_id ASC) AS INTEGER) AS rank
         |  FROM scored)
         |WHERE rank <= 5""".stripMargin,
    "q_emb_neardups" ->
      s"""WITH sig AS (SELECT id, sig
         |             FROM read_parquet('${sigGlob("vec_sigs")}')
         |             WHERE corpus_fp = $embFpSql),
         |ch AS (SELECT id, ci AS chunk, (sig >> (ci * 8)) & 255 AS chunk_val
         |       FROM sig, UNNEST(generate_series(0, 3)) AS t(ci)
         |       QUALIFY COUNT(*) OVER (PARTITION BY chunk, chunk_val)
         |               <= ${Dedup.DefaultMaxBucket}),
         |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |         FROM ch a JOIN ch b
         |           ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val
         |         WHERE a.id < b.id),
         |v AS (SELECT id_a, id_b,
         |        list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
         |        (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
         |         sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cosine
         |      FROM cand JOIN embeddings a ON a.vec_id = id_a
         |                JOIN embeddings b ON b.vec_id = id_b)
         |SELECT id_a, id_b, round(cosine, 3) AS cos3
         |FROM v WHERE cosine >= -1.0
         |ORDER BY cosine DESC, id_a, id_b LIMIT 100""".stripMargin,
    "q_stream_ivf" ->
      s"""WITH c AS (SELECT cluster_id, centroid
         |           FROM read_parquet('${sigGlob("ivf_cents")}')
         |           WHERE corpus_fp = $embFpSql),
         |s AS (SELECT v.vec_id AS id, c.cluster_id,
         |        round(list_dot_product(v.embedding::DOUBLE[], c.centroid::DOUBLE[]) /
         |          (sqrt(list_dot_product(v.embedding::DOUBLE[], v.embedding::DOUBLE[])) *
         |           sqrt(list_dot_product(c.centroid::DOUBLE[], c.centroid::DOUBLE[]))),
         |          6) AS sim6
         |      FROM embeddings v CROSS JOIN c
         |      WHERE v.vec_id < 200)
         |SELECT id, cluster_id, sim6 FROM s
         |QUALIFY row_number() OVER (PARTITION BY id
         |                           ORDER BY sim6 DESC, cluster_id) = 1""".stripMargin,
    "q_sem_dedup" ->
      s"""WITH a AS (SELECT id, cluster_id
         |           FROM read_parquet('${sigGlob("sem_assign")}')
         |           WHERE corpus_fp = $embFpSql),
         |capped AS (SELECT id, cluster_id FROM a
         |           QUALIFY COUNT(*) OVER (PARTITION BY cluster_id)
         |                   <= ${Dedup.DefaultMaxBucket}),
         |p AS (SELECT x.id AS id_a, y.id AS id_b
         |      FROM capped x JOIN capped y
         |        ON x.cluster_id = y.cluster_id AND x.id < y.id),
         |s AS (SELECT id_a, id_b,
         |        round(list_dot_product(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) /
         |          (sqrt(list_dot_product(ea.embedding::DOUBLE[], ea.embedding::DOUBLE[])) *
         |           sqrt(list_dot_product(eb.embedding::DOUBLE[], eb.embedding::DOUBLE[]))),
         |          3) AS cos3
         |      FROM p JOIN embeddings ea ON ea.vec_id = id_a
         |             JOIN embeddings eb ON eb.vec_id = id_b),
         |d AS (SELECT id_b AS id, CAST(MIN(id_a) AS BIGINT) AS dup_of
         |      FROM s WHERE cos3 >= 0.3 GROUP BY 1)
         |SELECT a.id AS vec_id, a.cluster_id,
         |       COALESCE(d.dup_of, -1) AS dup_of,
         |       d.dup_of IS NOT NULL AS dropped
         |FROM a LEFT JOIN d USING (id)""".stripMargin,
    "q_knn_ivf" ->
      s"""WITH cand AS (SELECT query_id, nbr_id
         |              FROM read_parquet('${sigGlob("ivf_cands")}')
         |              WHERE corpus_fp = $embFpSql),
         |scored AS (SELECT cand.query_id, cand.nbr_id,
         |             list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
         |             (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
         |              sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS sim
         |           FROM cand JOIN embeddings q ON q.vec_id = cand.query_id
         |                     JOIN embeddings c ON c.vec_id = cand.nbr_id)
         |SELECT query_id, nbr_id, rank FROM (
         |  SELECT query_id, nbr_id,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY round(sim, 6) DESC, nbr_id ASC) AS INTEGER) AS rank
         |  FROM scored)
         |WHERE rank <= 5""".stripMargin
  )

  /** Signature-parquet glob for the post-hash oracles — pinned to the
    * sf0.01 tag the driver's correctness gate runs at
    * ([[graft.ops.OracleSig.VerifySfTag]]); `oracleSql` is static, so it
    * cannot key off the runtime sf dir.
    */
  private def sigGlob(table: String): String =
    graft.ops.OracleSig.oracleGlob(table)

  /** Corpus-fingerprint scalars the six post-hash oracles filter the
    * multi-tag signature glob by — lockstep with the `corpus_fp` column
    * [[graft.ops.OracleSig.materialize]] stamps at write time, so each
    * oracle picks exactly the rows derived from ITS corpus regardless of
    * which sf the compare runs at.
    */
  private val docsFpSql = graft.ops.OracleSig.docsFpSql
  private val embFpSql = graft.ops.OracleSig.embFpSql
}

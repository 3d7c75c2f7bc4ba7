package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for training-data pipelines: exact (hash
  * group-by), MinHash+LSH, SimHash, and n-gram Jaccard verification.
  *
  * Scale shape: exact dedup is one map-side-combinable shuffle on the
  * digest; MinHash/LSH turns the O(n²) similarity problem into an
  * equi-join on (band, band_hash) — the only quadratic step is within a
  * bucket, bounded by banding parameters; SimHash candidates come from an
  * equi-join on 16-bit signature chunks.
  */
object Dedup {

  /** Exact duplicate groups keyed on the canonical fingerprint
    * (casefold + whitespace-collapse); keeper = min(id).
    */
  def exact(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    docs
      .groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /** Incremental EXACT dedup for a growing corpus — the third member of
    * the incremental family ([[graft.stream.IncrementalNearDup]],
    * [[graft.stream.IncrementalIvf]]): new documents stream in, each
    * batch keeps only fingerprints never seen before — neither in the
    * BASE snapshot's fingerprint set nor earlier in the stream. The
    * within-stream first-occurrence is streaming `dropDuplicates` state
    * (O(distinct new fps), the q_stream_dedup machinery); the base
    * check is a stream-static LEFT ANTI join against the snapshot's
    * distinct-fingerprint table — BROADCAST explicitly (AQE does not
    * re-plan micro-batches). At 100 TB the base side is a
    * fingerprint-only projection of the corpus (32 bytes/doc);
    * partitioned/bucketed storage makes it a shuffle-free probe.
    * Output: (idCol, fp) — the accepted-new documents.
    *
    * PRECONDITION: duplicates within one micro-batch survive as an
    * ARBITRARY row per fingerprint (dropDuplicates keeps whichever task
    * order delivers first) — callers needing a deterministic survivor
    * must guarantee within-batch fingerprint uniqueness (the driver feed
    * asserts it on the normalized form) or pre-reduce the batch.
    */
  def incrementalExact(newDocs: DataFrame, baseFps: DataFrame,
                       idCol: String = "doc_id", textCol: String = "text")
      : DataFrame =
    newDocs
      .select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .dropDuplicates("fp")
      .join(broadcast(baseFps), Seq("fp"), "left_anti")

  /** Word shingles (k-grams) of the normalized text; distinct per doc. */
  def shingles(text: Column, k: Int): Column = {
    val toks = split(trim(regexp_replace(lower(text), "\\s+", " ")), " ")
    array_distinct(
      filter(
        transform(toks, (_, i) =>
          when(i + k <= size(toks), concat_ws(" ", slice(toks, i + 1, lit(k))))),
        s => s.isNotNull))
  }

  /** Distinct shingle hash set per doc, built WITHOUT materializing
    * shingle strings: tokens are hashed once, a shingle hash is the
    * xxhash64 of its k token hashes (40 bytes, no concat_ws string
    * building). All downstream minhash/jaccard math runs on longs.
    * Collisions are negligible for dedup purposes (2^-64 per pair).
    * NOTE: callers must materialize the token-hash array as a real column
    * first ([[hashedDocs]]) — inlining it would duplicate the tokenize+
    * hash subtree k+1 times (no CSE through higher-order functions).
    */
  def shingleHashesFromTokenHashes(tokenHashes: Column, k: Int): Column =
    array_distinct(
      filter(
        transform(tokenHashes, (_, i) =>
          when(i + k <= size(tokenHashes),
               xxhash64((0 until k).map(j => get(tokenHashes, i + j)): _*))),
        x => x.isNotNull))

  /** String-shingle variant kept for the Jaccard-on-strings API. */
  def shingleHashSet(text: Column, k: Int): Column =
    array_distinct(transform(shingles(text, k), s => xxhash64(s)))

  /** MinHash signature over pre-hashed shingles: sig[h] = min over
    * xxhash64(h, base) — per-seed rehash of an 8-byte long, codegen'd.
    */
  def minhashSignature(shingleHashes: Column, numHashes: Int): Column =
    array((0 until numHashes).map { h =>
      array_min(transform(shingleHashes, x => xxhash64(lit(h), x)))
    }: _*)

  /** Memo of the persisted token-hash tables, keyed on (session,
    * canonicalized input plan, params): the same docs table is shingled
    * by several dedup queries per session, and re-persisting an identical
    * plan each call both leaked storage handles and spammed "already
    * cached" warnings (degrading that warning's diagnostic value).
    * Dead-session eviction + persist()-equivalent staleness semantics:
    * [[graft.ops.SessionMemo]].
    */
  private val hashedDocsCache =
    new graft.ops.SessionMemo[(Any, String, String, Int)]

  private def hashedDocs(docs: DataFrame, idCol: String, textCol: String,
                         shingleK: Int): DataFrame = {
    val key = (docs.queryExecution.analyzed.canonicalized: Any,
               idCol, textCol, shingleK)
    hashedDocsCache.getOrElseUpdate(docs.sparkSession, key) {
      // persist = a CollapseProject barrier: shingleHashesFromTokenHashes
      // references `th` k+1 times, and without the InMemoryRelation
      // boundary the optimizer inlines the tokenize+hash subtree into
      // every reference (measured 6× recompute). The cached array is also
      // what the candidate and verify stages share.
      val thDf = docs
        .select(col(idCol).as("id"),
          transform(
            split(trim(regexp_replace(lower(col(textCol)), "\\s+", " ")), " "),
            t => xxhash64(t)).as("th"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      thDf
        .select(col("id"),
                shingleHashesFromTokenHashes(col("th"), shingleK).as("sh"))
        .where(size(col("sh")) > 0)
    }
  }

  /** Production guard for LSH banding: every member pair of one bucket
    * self-joins, so one boilerplate cluster of 10⁶ near-identical docs
    * would make a single bucket O(cluster²) = 10¹² candidate pairs.
    * Buckets above `maxBucket` members are DROPPED from candidate
    * generation (their contents belong to exact dedup, which handles
    * identical-signature clusters in one linear shuffle); the dropped
    * buckets are reported by the `*OversizeBuckets` side outputs. The
    * window count rides the same (band, band_hash) shuffle the candidate
    * self-join needs anyway.
    */
  private def capBuckets(banded: DataFrame, bandCols: Seq[String],
                         maxBucket: Int): DataFrame =
    if (maxBucket == Int.MaxValue) banded
    else banded
      .withColumn("bsz",
        count(lit(1)).over(Window.partitionBy(bandCols.map(col): _*)))
      .where(col("bsz") <= maxBucket).drop("bsz")

  private def oversize(banded: DataFrame, bandCols: Seq[String],
                       maxBucket: Int): DataFrame =
    banded.groupBy(bandCols.map(col): _*)
      .agg(count(lit(1)).as("n_members"))
      .where(col("n_members") > maxBucket)

  /** The distinct-shingle-hash table (id, sh: array<bigint>) — the
    * materialization point of the MinHash pipeline: write this (and
    * [[minhashBands]]) to parquet once per corpus snapshot, and the whole
    * candidate + verify stage downstream is hash-free relational algebra
    * ([[minhashRankedFrom]]), independently checkable by a SQL oracle
    * over the same parquet ([[graft.ops.OracleSig]]).
    */
  def shingleTable(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", shingleK: Int = 5): DataFrame =
    hashedDocs(docs, idCol, textCol, shingleK)

  /** Non-memoized [[shingleTable]] for per-micro-batch inputs (the
    * incremental near-dup path): the token-hash CollapseProject barrier
    * is an eager localCheckpoint — freed with the plan — instead of a
    * session-lifetime persist; a streaming job shingling thousands of
    * batches must not accumulate cache entries (even LRU-bounded ones).
    * Same output, bit for bit, as [[shingleTable]].
    */
  def shingleTableOnce(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text", shingleK: Int = 5)
      : DataFrame = {
    val thDf = docs
      .select(col(idCol).as("id"),
        transform(
          split(trim(regexp_replace(lower(col(textCol)), "\\s+", " ")), " "),
          t => xxhash64(t)).as("th"))
      .localCheckpoint(true)
    thDf
      .select(col("id"),
              shingleHashesFromTokenHashes(col("th"), shingleK).as("sh"))
      .where(size(col("sh")) > 0)
  }

  /** LSH band table (id, band, band_hash) of a shingle-hash table —
    * UNcapped; the bucket cap is applied by the candidate join so the
    * materialized artifact records every bucket (including the oversize
    * ones the join drops — [[minhashOversizeBuckets]] reads them).
    */
  def minhashBands(sh: DataFrame, numHashes: Int = 32,
                   bands: Int = 8): DataFrame = bandedOf(sh, numHashes, bands)

  private def bandedOf(sh: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    sh.withColumn("sig", minhashSignature(col("sh"), numHashes))
      .select(
        col("id"),
        posexplode(array((0 until bands).map { b =>
          xxhash64(slice(col("sig"), b * rows + 1, rows))
        }: _*)).as(Seq("band", "band_hash")))
  }

  private def candidatesFromBands(banded0: DataFrame,
                                  maxBucket: Int): DataFrame = {
    val banded = capBuckets(banded0, Seq("band", "band_hash"), maxBucket)
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  private def candidatesFrom(sh: DataFrame, numHashes: Int, bands: Int,
                             maxBucket: Int = DefaultMaxBucket): DataFrame =
    candidatesFromBands(bandedOf(sh, numHashes, bands), maxBucket)

  /** Default LSH bucket-size cap: 10⁴ members = ≤ 5·10⁷ pairs per bucket,
    * bounded work per task; raise explicitly for corpora where genuine
    * (non-exact-dup) clusters are expected to be larger.
    */
  val DefaultMaxBucket: Int = 10000

  /** Counted side output of the bucket cap: MinHash band buckets whose
    * membership exceeded `maxBucket` (dropped from candidate generation),
    * with their sizes — the observability half of the guard rail (the
    * reference's blowup-warning philosophy, builders.py:379-380).
    */
  def minhashOversizeBuckets(docs: DataFrame, idCol: String = "doc_id",
                             textCol: String = "text", shingleK: Int = 5,
                             numHashes: Int = 32, bands: Int = 8,
                             maxBucket: Int = DefaultMaxBucket): DataFrame =
    oversize(bandedOf(hashedDocs(docs, idCol, textCol, shingleK),
                      numHashes, bands),
             Seq("band", "band_hash"), maxBucket)

  private[graft] def verifyFrom(sh: DataFrame, candidates: DataFrame): DataFrame =
    candidates
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
         size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))

  /** Candidate near-duplicate pairs via LSH banding: signatures split into
    * `bands` bands of numHashes/bands rows; docs sharing any band hash are
    * candidates. Returns (id_a, id_b) with id_a < id_b, distinct.
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        shingleK: Int = 5, numHashes: Int = 32,
                        bands: Int = 8,
                        maxBucket: Int = DefaultMaxBucket): DataFrame =
    candidatesFrom(hashedDocs(docs, idCol, textCol, shingleK), numHashes,
                   bands, maxBucket)

  /** Shingle-set Jaccard for candidate pairs — the verification step after
    * LSH (computed on hashed shingle sets).
    */
  def jaccardVerify(docs: DataFrame, candidates: DataFrame,
                    idCol: String, textCol: String, shingleK: Int = 5)
      : DataFrame =
    verifyFrom(hashedDocs(docs, idCol, textCol, shingleK), candidates)

  /** End-to-end MinHash near-dup pipeline: LSH candidates → Jaccard ≥
    * threshold. The shingle-hash table is computed once and persisted
    * across the candidate and verify stages (the reference's cache-then-
    * pair pattern, analysis.py:235-239).
    */
  def minhashNearDups(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", shingleK: Int = 5,
                      numHashes: Int = 32, bands: Int = 8,
                      threshold: Double = 0.7,
                      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val sh = hashedDocs(docs, idCol, textCol, shingleK)
    verifyFrom(sh, candidatesFrom(sh, numHashes, bands, maxBucket))
      .where(col("jaccard") >= threshold)
  }

  /** Candidates + jaccard without threshold, best-first — the queries()
    * surface (never empty when any candidate exists).
    */
  def minhashRanked(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", shingleK: Int = 5,
                    numHashes: Int = 32, bands: Int = 8, limit: Int = 200)
      : DataFrame = {
    val sh = hashedDocs(docs, idCol, textCol, shingleK)
    verifyFrom(sh, candidatesFrom(sh, numHashes, bands))
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(limit)
  }

  /** [[minhashRanked]]'s post-hash half over PRE-MATERIALIZED signature
    * tables: `sh` = (id, sh) from [[shingleTable]], `banded` = (id, band,
    * band_hash) from [[minhashBands]] — typically both read back from the
    * parquet a pipeline (or [[graft.ops.OracleSig]]) wrote. Everything
    * here — bucket cap, banding self-join, Jaccard verify, ranking — is
    * hash-free and therefore SQL-oracle-checkable over the same parquet.
    */
  def minhashRankedFrom(sh: DataFrame, banded: DataFrame,
                        maxBucket: Int = DefaultMaxBucket,
                        limit: Int = 200): DataFrame =
    verifyFrom(sh, candidatesFromBands(banded, maxBucket))
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(limit)

  /** [[minhashNearDups]]'s post-hash half over pre-materialized signature
    * tables (same contract as [[minhashRankedFrom]]): thresholded
    * verified pairs (id_a < id_b) — bucket cap, banding self-join, and
    * Jaccard verify are all hash-free and SQL-oracle-checkable over the
    * same parquet.
    */
  def minhashNearDupsFrom(sh: DataFrame, banded: DataFrame,
                          threshold: Double,
                          maxBucket: Int = DefaultMaxBucket): DataFrame =
    verifyFrom(sh, candidatesFromBands(banded, maxBucket))
      .where(col("jaccard") >= threshold)

  /** Near-duplicate CLUSTERS from verified pairs: connected components
    * over the pair graph (near-duplication is transitive only through
    * chains — A≈B≈C belong together even when jaccard(A,C) is below
    * threshold, which pair output alone misses), one row per multi-doc
    * cluster with the canonical keeper (longest text, ties → lowest id)
    * and the bytes a keep-one-per-cluster dedup pass saves. This is the
    * cluster-level shape a training-data pipeline actually deletes by.
    *
    * Numeric ids ride the component kernel as ZERO-PADDED strings so the
    * kernel's lexicographic min-label IS the numeric min; the label is
    * cast back for output. Scale: the pair graph is tiny relative to the
    * corpus (near-dup pairs only), components run on it — never on the
    * corpus — and the single corpus-sized join fetches keeper lengths.
    */
  def clustersFromPairs(pairs: DataFrame, docs: DataFrame,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame =
    clusterMembers(pairs, docs, idCol, textCol)
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_docs"),
           max(when(col("is_keeper"), col(idCol))).as("keep_id"),
           (sum("n_bytes") - max("n_bytes")).as("dup_bytes"))
      .select(col("cluster_id"), col("n_docs"), col("keep_id"),
              col("dup_bytes"))

  /** The per-member view [[clustersFromPairs]] rolls up: (cluster_id,
    * idCol, n_bytes, is_keeper) — one row per clustered doc, exactly one
    * keeper per cluster (longest text, ties → lowest id). The filter
    * shape a pipeline deletes with: `where(!is_keeper)` is the drop list.
    */
  def clusterMembers(pairs: DataFrame, docs: DataFrame,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    def pad(c: Column) = format_string("%012d", c)
    val edges = pairs.select(pad(col("id_a")).as("src"),
                             pad(col("id_b")).as("dst"))
    val members = graft.graph.Graph.connectedComponents(edges)
      .select(col("label").cast("long").as("cluster_id"),
              col("node").cast("long").as(idCol))
    val keeperOrder = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
      .orderBy(col("n_bytes").desc, col(idCol).asc)
    members.join(
        docs.select(col(idCol), octet_length(col(textCol)).as("n_bytes")),
        idCol)
      .withColumn("is_keeper", row_number().over(keeperOrder) === 1)
  }

  /** Embedding-cosine near-duplicates: random-hyperplane LSH buckets the
    * corpus against itself, exact cosine verifies candidates ≥ threshold —
    * the vector-space member of the dedup family (pairs with id_a < id_b).
    *
    * Scale shape: the banding self-join carries ONLY ids (the chunk
    * explode would otherwise copy every vector nChunks times through the
    * shuffle, and the old pair-level distinct() shuffled two full vectors
    * per row); vectors and norms are fetched once per side at rerank.
    * Buckets above `maxBucket` are dropped ([[capBuckets]]).
    */
  /** Signature chunks of an embedding table — the shared banding input of
    * [[embeddingNearDups]] and [[embeddingOversizeBuckets]] (one
    * definition so the dropped-bucket side output always corresponds to
    * the buckets the candidate join actually sees).
    */
  /** Chunk explode of a hyperplane-signature table (id, sig) — the shared
    * post-hash banding step of the vector-LSH family ([[embeddingNearDups]]
    * and [[graft.sim.Knn.lshTopKFromSigs]]).
    */
  private[graft] def chunksOfSigs(sigs: DataFrame, bits: Int,
                                  bandBits: Int): DataFrame = {
    require(bits % bandBits == 0)
    val nChunks = bits / bandBits
    val mask = (1L << bandBits) - 1
    sigs.select(col("id"),
      posexplode(array((0 until nChunks).map { c =>
        shiftright(col("sig"), c * bandBits).bitwiseAND(mask)
      }: _*)).as(Seq("chunk", "chunk_val")))
  }

  private def embChunks(emb: DataFrame, idCol: String, vecCol: String,
                        bits: Int, bandBits: Int): DataFrame =
    chunksOfSigs(
      emb.select(col(idCol).as("id"),
                 graft.sim.Knn.lshSignature(col(vecCol), bits).as("sig")),
      bits, bandBits)

  def embeddingNearDups(emb: DataFrame, idCol: String = "vec_id",
                        vecCol: String = "embedding",
                        threshold: Double = 0.95,
                        bits: Int = 32, bandBits: Int = 8,
                        maxBucket: Int = DefaultMaxBucket): DataFrame =
    embeddingNearDupsFromSigs(
      emb,
      emb.select(col(idCol).as("id"),
                 graft.sim.Knn.lshSignature(col(vecCol), bits).as("sig")),
      idCol, vecCol, threshold, bits, bandBits, maxBucket)

  /** [[embeddingNearDups]]'s post-hash half over a pre-materialized
    * hyperplane-signature table (id, sig) from
    * [[graft.sim.Knn.lshSignatures]] — banding, cap, candidate join, and
    * the exact-cosine verify are signature/vector algebra, SQL-oracle-
    * checkable over the written parquet plus the embeddings table.
    */
  def embeddingNearDupsFromSigs(emb: DataFrame, sigs: DataFrame,
                                idCol: String = "vec_id",
                                vecCol: String = "embedding",
                                threshold: Double = 0.95,
                                bits: Int = 32, bandBits: Int = 8,
                                maxBucket: Int = DefaultMaxBucket)
      : DataFrame = {
    import graft.sim.Knn
    val chunked = chunksOfSigs(sigs, bits, bandBits)
    val capped = capBuckets(chunked, Seq("chunk", "chunk_val"), maxBucket)
    val cands = capped.as("a")
      .join(capped.as("b"),
        col("a.chunk") === col("b.chunk") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val v = emb.select(col(idCol).as("vid"), col(vecCol).as("vv"))
      .withColumn("vn", Knn.norm(col("vv")))
    cands
      .join(v.select(col("vid").as("id_a"), col("vv").as("va"),
                     col("vn").as("na")), Seq("id_a"))
      .join(v.select(col("vid").as("id_b"), col("vv").as("vb"),
                     col("vn").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
              (Knn.dot(col("va"), col("vb")) / (col("na") * col("nb")))
                .as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** SemDeDup-style semantic dedup (cluster-then-dedup-within-cluster,
    * the Abbas et al. 2023 recipe): k-means-cluster the embedding space
    * — [[graft.sim.Ivf.trainCentroids]]/[[graft.sim.Ivf.assign]] supply
    * the (id, cluster_id) hard assignment, materialized once per corpus
    * snapshot like every index artifact here — then mark a vector a
    * semantic duplicate iff some LOWER-id member of its OWN cluster has
    * round(cosine, 3) ≥ `threshold` (keep-lowest-id representative: the
    * canonical greedy variant is removal-order-dependent and therefore
    * non-relational; this rule is order-free and oracle-exact). The
    * verdict rounds BEFORE thresholding so the drop decision is a pure
    * function of the cross-engine-bit-stable cos3.
    *
    * Scale shape: the pair problem shrinks from O(n²) to Σ cᵢ² confined
    * within clusters — `nClusters` is the knob (√n clusters ⇒ expected
    * cluster size √n ⇒ pair volume ~n^1.5, further bounded by
    * `maxCluster` with the same counted-cap mechanism as the banding
    * families — [[oversizeClusters]] is the side output). Over-cap
    * clusters contribute no pairs (their members all report
    * dropped=false), never a corpus-sized blowup.
    *
    * Output, one row per assigned vector: (idCol, cluster_id, dup_of,
    * dropped) with dup_of = lowest qualifying same-cluster id, −1 when
    * none (sentinel, not null — nullable-int columns decay to float in
    * the compare harness's pandas leg).
    */
  def semanticDedupFromAssign(emb: DataFrame, assign: DataFrame,
                              threshold: Double,
                              idCol: String = "vec_id",
                              vecCol: String = "embedding",
                              maxCluster: Int = DefaultMaxBucket)
      : DataFrame = {
    import graft.sim.Knn
    val capped = capBuckets(assign, Seq("cluster_id"), maxCluster)
    val v = emb.select(col(idCol).as("vid"), col(vecCol).as("vv"))
      .withColumn("vn", Knn.norm(col("vv")))
    val dups = capped.as("a")
      .join(capped.as("b"),
        col("a.cluster_id") === col("b.cluster_id") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .join(v.select(col("vid").as("id_a"), col("vv").as("va"),
                     col("vn").as("na")), Seq("id_a"))
      .join(v.select(col("vid").as("id_b"), col("vv").as("vb"),
                     col("vn").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
              round(Knn.dot(col("va"), col("vb")) / (col("na") * col("nb")),
                    3).as("cos3"))
      .where(col("cos3") >= threshold)
      .groupBy(col("id_b").as("id"))
      .agg(min("id_a").as("dup_of"))
    assign.join(dups, Seq("id"), "left")
      .select(col("id").as(idCol), col("cluster_id"),
              coalesce(col("dup_of"), lit(-1L)).as("dup_of"),
              col("dup_of").isNotNull.as("dropped"))
  }

  /** Counted side output for [[semanticDedupFromAssign]]'s cluster cap:
    * (cluster_id, n) for every cluster whose membership exceeds the cap
    * and therefore contributed no dedup pairs.
    */
  def oversizeClusters(assign: DataFrame,
                       maxCluster: Int = DefaultMaxBucket): DataFrame =
    assign.groupBy("cluster_id").agg(count(lit(1)).as("n"))
      .where(col("n") > maxCluster)

  /** Counted side output: over-cap embedding LSH buckets (see
    * [[minhashOversizeBuckets]]).
    */
  def embeddingOversizeBuckets(emb: DataFrame, idCol: String = "vec_id",
                               vecCol: String = "embedding",
                               bits: Int = 32, bandBits: Int = 8,
                               maxBucket: Int = DefaultMaxBucket): DataFrame =
    oversize(embChunks(emb, idCol, vecCol, bits, bandBits),
             Seq("chunk", "chunk_val"), maxBucket)

  /** 64-bit SimHash signature per doc: bit j is the sign of
    * Σ_tokens (bit_j(xxhash64(token)) ? +1 : -1). Static per-bit aggregate
    * columns keep the whole computation inside whole-stage codegen with a
    * single shuffle on the doc id.
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val toks = docs.select(
      col(idCol).as("id"),
      explode(split(trim(regexp_replace(lower(col(textCol)), "\\s+", " ")), " "))
        .as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"b$j")
    }
    val sums = toks.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { j =>
      when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    sums.select(col("id"), sig.as("simhash"))
  }

  /** SimHash near-dup candidates: docs sharing any of the four 16-bit
    * signature chunks (guarantees recall for hamming distance ≤ 3 across
    * chunks), verified by exact hamming ≤ maxHamming via bit_count(xor).
    */
  def simhashNearDups(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", maxHamming: Int = 6,
                      maxBucket: Int = DefaultMaxBucket)
      : DataFrame =
    simhashNearDupsFrom(simhash(docs, idCol, textCol), maxHamming, maxBucket)

  /** [[simhashNearDups]]'s post-hash half over a pre-materialized
    * signature table (id, simhash) from [[simhash]]: chunk explode,
    * bucket cap, candidate join, and the bit_count(xor) hamming verify
    * are all signature-value algebra — SQL-oracle-checkable over the
    * written parquet ([[graft.ops.OracleSig]]).
    */
  /** C4-style line-level deduplication: split every document into lines
    * on `delim`, keep only the FIRST corpus-order occurrence (lowest
    * (id, line_idx)) of each distinct line, and reassemble — the
    * boilerplate-removal pass (repeated headers/footers/navigation
    * chrome) that runs at line granularity where [[exact]] runs at
    * document granularity. Output, one row per input document:
    * (idCol, n_lines, kept_lines, text) with `text` the surviving lines
    * re-joined by `delim` ('' when every line was seen earlier).
    *
    * Scale shape: two shuffles on the exploded line relation. The
    * first-occurrence computation is a `min(struct(id, line_idx))`
    * GROUP BY on the md5 line digest — map-side combinable, so the
    * boilerplate line that appears 10⁹ times collapses to one row per
    * map partition BEFORE the shuffle (the row_number()-window
    * formulation the oracle uses would funnel every copy of a hot line
    * through one task's sort — correct, but a skew bomb at corpus
    * scale); the verdict join back is digest-keyed equi-join (AQE
    * splits any residual hot digest). Reassembly is one id-keyed
    * shuffle of the kept lines (`array_sort(collect_list(struct))` —
    * per-doc line counts are bounded by document length).
    */
  def lineDedup(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text", delim: String = "\n")
      : DataFrame = {
    val lines = docs.select(col(idCol),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(delim))).as(Seq("line_idx", "line")))
      .withColumn("lk", md5(col("line")))
    val first = lines.groupBy("lk")
      .agg(min(struct(col(idCol), col("line_idx"))).as("first_occ"))
    lines.join(first, "lk")
      .withColumn("keep",
        struct(col(idCol), col("line_idx")) === col("first_occ"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).cast("int").as("n_lines"),
        sum(when(col("keep"), 1L).otherwise(0L)).cast("int").as("kept_lines"),
        array_join(
          transform(
            filter(
              array_sort(collect_list(
                struct(col("line_idx"), col("keep"), col("line")))),
              x => x.getField("keep")),
            x => x.getField("line")),
          delim).as(textCol))
  }

  def simhashNearDupsFrom(sigs: DataFrame, maxHamming: Int = 6,
                          maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val chunked = capBuckets(
      sigs.select(
        col("id"), col("simhash"),
        posexplode(array((0 until 4).map { c =>
          shiftright(col("simhash"), c * 16).bitwiseAND(0xffffL)
        }: _*)).as(Seq("chunk", "chunk_val"))),
      Seq("chunk", "chunk_val"), maxBucket)
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}

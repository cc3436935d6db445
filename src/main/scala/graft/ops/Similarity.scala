package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Det._
import graft.io.Sources

/** Vector similarity operators (SURVEY.md §2 I): exact cosine top-k, kNN
  * classification, and the scale path — LSH-bucketed approximate nearest
  * neighbours. All dot products are higher-order-function folds (zip_with
  * + aggregate) in DOUBLE — codegen'd, no UDF serialization, and exactly
  * the arithmetic the DuckDB oracle performs (SURVEY §2 I).
  *
  * Scale: probes are always the broadcast side (a probe set is small by
  * definition); the corpus side streams. Brute force is O(|corpus|·|probe|)
  * per partition with no shuffle of the corpus; the LSH variant prunes the
  * corpus side by bucket equality — a hash join instead of a cross join.
  */
object Similarity {

  /** Elementwise dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
              lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native codegen'd cosine (graft.functions.CosineSimilarity) — same
    * arithmetic as `cosine`, one fused primitive loop, no intermediate
    * arrays. Used in the hot ANN paths.
    */
  def cosineNative(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.CosineSimilarity(
        org.apache.spark.sql.graftbridge.Bridge.expression(a),
        org.apache.spark.sql.graftbridge.Bridge.expression(b)))

  /** L2-normalize an embedding (multimodal column hygiene — north star). */
  def normalize(a: Column): Column = {
    val n = norm(a)
    transform(a, x => (x.cast("double") / n).cast("float"))
  }

  // ---------- declared query keys ----------

  /** q_sim_cosine_topk: top-5 cosine neighbours of probe vec_id=0
    * (round 6 dp, vec_id tiebreak). Probe broadcast; corpus streamed.
    */
  def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Sources.embeddings(spark, dir)
    val probe = e.filter(col("vec_id") === 0).select(col("embedding").as("probe_emb"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), r6(cosineNative(col("embedding"), col("probe_emb"))).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
  }

  /** q_knn_majority: k=5 nearest (cosine) majority label for probes
    * vec_id 0..9; ties → smallest label. Probes broadcast; one window per
    * probe for the top-k, one for the vote.
    */
  def knnMajority(spark: SparkSession, dir: String): DataFrame = {
    val e = Sources.embeddings(spark, dir)
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))
    val cand = e.filter(col("vec_id") >= 10)
    val wTop = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("vec_id"))
    val neighbours = cand.crossJoin(broadcast(probes))
      .select(col("probe_id"), col("vec_id"), col("label"),
              r6(cosineNative(col("embedding"), col("probe_emb"))).as("sim"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= 5)
    val wVote = Window.partitionBy(col("probe_id")).orderBy(col("votes").desc, col("label"))
    neighbours.groupBy(col("probe_id"), col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(wVote))
      .filter(col("vr") === 1)
      .select(col("probe_id"), col("label").as("pred_label"), col("votes"))
      .orderBy(col("probe_id"))
  }

  /** q_sim_neardup: exact pairwise cosine similar-pair mining above a
    * threshold, DECLARED over a deterministic md5-digit half-slice of the
    * corpus (Scale.sampleByMd5 semantics, mirrored verbatim in the oracle
    * SQL) so the declared query's input — and therefore its pair count —
    * is deterministically bounded rather than all-pairs over the full
    * corpus. The unbounded exact form (`simPairsExact`) stays API-only as
    * the ground truth the LSH path (nearDupPairs) is tolerance-tested
    * against; the production-scale path for the FULL corpus is always
    * nearDupPairs (banded hash join), never this exact miner.
    *
    * Round-6 BEFORE the threshold test so the boundary cannot flip
    * between engines.
    */
  def simPairsQuery(spark: SparkSession, dir: String): DataFrame =
    simPairsExact(
      // ABSOLUTE slice bound (vec_id < 2000) on top of the md5-digit
      // half-sample: exact all-pairs mining is quadratic by semantics, so
      // the declared gate's work must stay CONSTANT as the corpus grows
      // (at sf ≤ 0.1 the bound is a no-op; at 10× it caps the slice
      // instead of quadrupling the pair count 100×). The unbounded scale
      // path is nearDupPairs (sign-LSH banding).
      Scale.sampleByMd5(
        Sources.embeddings(spark, dir).filter(col("vec_id") < 2000), "vec_id",
        (0 to 7).map(_.toHexString)),
      threshold = 0.45)

  /** Exact threshold pair mining as a BLOCK-REPLICATED EQUI-JOIN: the
    * right side is hash-bucketed into `blocks` groups, the left side is
    * exploded to every block id, and the join runs on the block key — a
    * shuffled hash/sort-merge join, NOT a BroadcastNestedLoopJoin. Total
    * comparisons are still O(n²) (inherent to exact mining — bound n or
    * use nearDupPairs), but the work is spread evenly over `blocks`
    * reducers with ~n/blocks right rows each, instead of every pair
    * hitting one nested-loop task.
    */
  def simPairsExact(emb: DataFrame, threshold: Double, blocks: Int = 32): DataFrame = {
    val right = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
      .withColumn("__blk", pmod(xxhash64(col("id_b")), lit(blocks)))
    val left = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
      .withColumn("__blk", explode(array((0 until blocks).map(i => lit(i.toLong)): _*)))
    // threshold in the join condition: only surviving pairs materialize
    left.join(right, left("__blk") === right("__blk") &&
                     col("id_a") < col("id_b") &&
                     r6(cosineNative(col("ea"), col("eb"))) >= threshold)
      .select(col("id_a"), col("id_b"), r6(cosineNative(col("ea"), col("eb"))).as("sim"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** q_sim_users: sparse-feature similarity join (behavioral cosine) —
    * each probe user's hourly-activity vector against every other user's,
    * computed as a JOIN ON THE SHARED BUCKET rather than dense vectors:
    * dot(a,b) = Σ_h a_h·b_h only needs rows where both are active. Counts
    * are integers, so the partial sums are EXACT (BIGINT) and only the
    * final ratio is floating — fully portable. The probe side broadcasts;
    * the full vector table streams: the 100 TB shape for user-user
    * similarity (the dense alternative shuffles |users|² pairs).
    */
  def userSimilarityQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = Sources.events(spark, dir)
    val v = e.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    val norms = v.groupBy(col("user_id"))
      .agg(sqrt(sum(col("n") * col("n")).cast("double")).as("nrm"))
    val p = v.filter(col("user_id") < 5)
      .select(col("user_id").as("probe_id"), col("h").as("ph"), col("n").as("pn"))
    val dots = broadcast(p)
      .join(v, col("ph") === col("h") && col("user_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("user_id").as("other_id"))
      .agg(sum(col("pn") * col("n")).cast("double").as("dot"))
    val na = norms.select(col("user_id").as("probe_id"), col("nrm").as("nrm_a"))
    val nb = norms.select(col("user_id").as("other_id"), col("nrm").as("nrm_b"))
    val sims = dots
      .join(broadcast(na), Seq("probe_id"))
      .join(broadcast(nb), Seq("other_id"))
      .select(col("probe_id"), col("other_id"),
              r6(col("dot") / (col("nrm_a") * col("nrm_b"))).as("sim"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("other_id"))
    sims.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("probe_id"), col("other_id"), col("sim"), col("rn"))
      .orderBy(col("probe_id"), col("rn"))
  }

  // ---------- API-only operators (north star; ScalaTest-covered) ----------

  /** Brute-force cosine top-k for an arbitrary probe set (the baseline
    * ANN). Returns (probe_id, vec_id, sim, rn≤k).
    */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("vec_id"))
    corpus.crossJoin(broadcast(probes))
      .select(col("probe_id"), col("vec_id"), col("label"),
              r6(cosineNative(col("embedding"), col("probe_emb"))).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** PORTABLE sign matrix for the oracle-gated embedding LSH: plane p's
    * ±1 component for dimension d is the first md5 hex nibble of "p:d"
    * (< 8 → +1) — the md5-component determinism pattern (q_dedup_minhash
    * family) applied to hyperplanes. Data-independent constants, computed
    * driver-side once per query build (64×64 = 4096 values).
    */
  private def md5Sign(p: Int, d: Int): Long = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$d".getBytes("UTF-8"))
    if (((digest(0) >> 4) & 0xF) < 8) 1L else -1L
  }

  /** q_embed_lsh / q_embed_lsh_recall shared core: banded sign-projection
    * candidate pairs over the FULL embedding corpus — the ORACLE-GATED
    * twin of [[nearDupPairs]] (whose xxhash64 planes and double dot sums
    * are engine-specific, hence API-only). Every step is cross-engine
    * exact: embeddings quantize to round(x·1e6) BIGINTs (monotone, both
    * engines round half away from zero, and the sign of a quantized dot
    * IS the declared hash — no IEEE summation order anywhere); plane
    * signs come from md5 nibbles; the 64-plane signature splits into
    * 8 bands × 8 bits; candidates = docs equal on any (band_idx,
    * band_val) — a hash EQUI-join, never all-pairs; exact cosine (the
    * q_sim_neardup-proven round-6 form) scores each candidate once.
    * Returns (id_a, id_b, sim) for ALL banded candidates, unfiltered.
    *
    * Scale shape: signature build is map-side (64 exact integer dots per
    * row over zip_with literals); the only shuffles are the banding
    * equi-join on (band_idx, band_val) and the pair distinct — candidate
    * volume ∝ collisions (P ≈ 2⁻⁸ per band for unrelated pairs, ~3% of
    * pairs in 8 bands), the price of the OR-construction's recall.
    */
  def embedLshCandidates(emb: DataFrame,
                         planes: Int = 64, bandBits: Int = 8): DataFrame = {
    val nBands = planes / bandBits
    val dims = emb.select(size(col("embedding"))).head().getInt(0) // 1-row probe
    val q = emb.select(col("vec_id"), col("embedding"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1e6).cast("long")).as("qe"))
    val dots = (0 until planes).map { p =>
      val signs = array((0 until dims).map(d => lit(md5Sign(p, d))): _*)
      aggregate(zip_with(col("qe"), signs, (x, s) => x * s),
                lit(0L), (acc, v) => acc + v).as(s"__dot$p")
    }
    // no checkpoint here: the self-join's two sides are IDENTICAL
    // subplans, so exchange reuse computes the signature shuffle once —
    // measured 17.6 s WITH an eager localCheckpoint vs 15.0 s without at
    // sf1, and re-measured in r12 (banded-frame checkpoint: q_embed_lsh
    // 2.21→1.87 but q_embed_lsh_recall 1.56→2.13, net LOSS — the initial
    // explain shows two full signature subtrees, but AQE's runtime stage
    // reuse dedups them, so the checkpoint only adds a materialization
    // round trip; contrast lshScoredCandidates, whose signature build
    // dominates per-row cost)
    // r12 opt (guide §2.3/§8 — decide with small rows, move payloads
    // once): the banding self-join shuffles ONLY (vec_id, band_idx,
    // band_val) — the embedding no longer rides the 8-way band explode
    // through both exchange sides (measured 59 MB shuffle read → ids
    // only); the exact-rescore embeddings re-attach to the DEDUPED pair
    // list by two id equi-joins against the plain (vec_id, embedding)
    // projection, which the planner can broadcast or hash-join at
    // output-pair grain. Same pairs, same cosine inputs ⇒ same sims.
    val withBands = q.select(col("vec_id") +: col("embedding") +: dots: _*)
      .select(col("vec_id"),
        explode(array((0 until nBands).map { b =>
          struct(lit(b).as("band_idx"),
            (0 until bandBits).map(i =>
              when(col(s"__dot${b * bandBits + i}") >= 0, lit(1L << i))
                .otherwise(lit(0L))).reduce(_ + _).as("band_val"))
        }: _*)).as("b"))
      .select(col("vec_id"), col("b.band_idx"), col("b.band_val"))
    val pairs = withBands.as("x").join(withBands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val embs = emb.select(col("vec_id"), col("embedding"))
    pairs
      .join(embs.select(col("vec_id").as("id_a"), col("embedding").as("ea")), Seq("id_a"))
      .join(embs.select(col("vec_id").as("id_b"), col("embedding").as("eb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
              r6(cosineNative(col("ea"), col("eb"))).as("sim"))
  }

  /** The embedding corpus with a DETERMINISTIC 25% RE-INGEST: every
    * vector whose md5 first digit is 0–3 appears a second time re-keyed
    * by +base (base = max(vec_id)+1, a 1-row probe). This is the
    * at-least-once-ingest reality the embedding-dedup operator exists
    * for (the q_stream_dedup_exec self-union pattern at the vector
    * grain): re-crawled or re-encoded content lands again with a new id,
    * and the corpus' only TRUE near-duplicate structure is exactly those
    * re-ingests — this synthetic corpus' organic pair sims top out
    * ≈ 0.51 (measured), below any dedup threshold, so without the
    * re-ingest a near-dup operator has nothing to find (and hyperplane
    * LSH at mid-range thresholds is the WRONG tool by design — that
    * regime belongs to IVF, gated at q_ivf_search/q_ann_recall).
    */
  def embedReingested(spark: SparkSession, dir: String): DataFrame = {
    val emb = Sources.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val base = emb.agg((max(col("vec_id")) + 1L).as("b")).head().getLong(0) // 1-row probe
    val dup = emb
      .filter(substring(md5(col("vec_id").cast("string")), 1, 1).isin("0", "1", "2", "3"))
      .select((col("vec_id") + base).as("vec_id"), col("embedding"))
    emb.unionByName(dup)
  }

  /** q_embed_lsh: embedding DEDUP end-to-end under the gate — the
    * q_dedup_lsh_candidates analogue for an embedding column: portable
    * signature → banding equi-join over the full re-ingested corpus →
    * exact rescore → sim >= 0.8. The declared output is precisely the
    * re-ingested duplicate pairs (identical vectors rescore to r6 = 1.0;
    * organic pairs top out ≈ 0.51), found WITHOUT any all-pairs stage.
    */
  def embedLshQuery(spark: SparkSession, dir: String): DataFrame =
    embedLshCandidates(embedReingested(spark, dir))
      .filter(col("sim") >= 0.8)
      .orderBy(col("id_a"), col("id_b"))

  /** q_embed_lsh_recall: the recall audit (the q_lsh_recall pattern for
    * embeddings) — of the TRUE sim >= 0.8 pairs on the bounded exact
    * panel (original id < 1000 plus their re-ingested copies, md5-half
    * sampled), which does the banded sign-LSH surface? Theory: a pair at
    * cosine s agrees per bit with P = 1 − arccos(s)/π, an 8-bit band
    * matches with P^8 and any of 8 bands 1−(1−P^8)^8 → 1 as s → 1; at
    * the dedup operating point (identical vectors, s = 1) EVERY band
    * matches, so measured recall must be EXACTLY 1 — the audit proves
    * the operator complete in its design regime, pair by pair.
    */
  def embedLshRecallQuery(spark: SparkSession, dir: String): DataFrame = {
    val corpus = embedReingested(spark, dir)
    val base = Sources.embeddings(spark, dir)
      .agg((max(col("vec_id")) + 1L).as("b")).head().getLong(0)
    // ABSOLUTE panel bound (original id < 1000 + their re-ingests — at
    // most 1250 vectors at ANY scale factor): the exact miner is
    // quadratic by semantics, so the gate's ground-truth work must stay
    // constant as the corpus grows (the q_sim_neardup rule)
    val panel = corpus.filter(
      when(col("vec_id") >= base, col("vec_id") - base)
        .otherwise(col("vec_id")) < 1000)
    val truePairs = simPairsExact(panel, threshold = 0.8)
      .select(col("id_a"), col("id_b"), col("sim"))
    val cand = embedLshCandidates(corpus)
      .select(col("id_a"), col("id_b"), lit(1L).as("found"))
    truePairs.join(cand, Seq("id_a", "id_b"), "left")
      .select(col("id_a"), col("id_b"), col("sim"),
              coalesce(col("found"), lit(0L)).as("found"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Deterministic random-hyperplane sign bits: plane p's component for
    * dimension i is derived from xxhash64(seed, p, i), mapped to ±1.
    * sign(v) = bit vector of sign(v·plane_p) — classic SimHash/LSH for
    * cosine similarity, built entirely from column expressions.
    */
  def lshSignature(emb: Column, planes: Int, seed: Int = 42): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(1), size(emb)),
          (x, i) => x.cast("double") *
            // hash(seed, plane, dim) → uniform ±1
            when(pmod(xxhash64(lit(seed), lit(p), i), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Split a `planes`-bit signature into (band_idx, band_val) pairs of
    * `bandBits` bits each — the classic banded-LSH OR-construction.
    */
  private def bandArray(sig: Column, planes: Int, bandBits: Int): Column = {
    val nBands = planes / bandBits
    array((0 until nBands).map { b =>
      struct(lit(b).as("band_idx"),
             pmod(shiftright(sig, b * bandBits), lit(1L << bandBits)).as("band_val"))
    }: _*)
  }

  /** LSH-bucketed ANN: signatures are split into bands; a corpus vector is
    * a candidate for a probe if ANY band matches (OR-construction — high
    * recall), then exact cosine re-ranks the candidates. At 100 TB the
    * cross join becomes a hash join on (band_idx, band_val) — the scale
    * path: candidate count ≈ corpus/2^bandBits per band instead of the
    * full corpus.
    */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int,
              planes: Int = 16, bandBits: Int = 8): DataFrame = {
    val cs = corpus
      .withColumn("b", explode(bandArray(lshSignature(col("embedding"), planes), planes, bandBits)))
      .select(col("vec_id"), col("label"), col("embedding"),
              col("b.band_idx").as("band_idx"), col("b.band_val").as("band_val"))
    val ps = probes
      .withColumn("b", explode(bandArray(lshSignature(col("probe_emb"), planes), planes, bandBits)))
      .select(col("probe_id"), col("probe_emb"),
              col("b.band_idx").as("band_idx"), col("b.band_val").as("band_val"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("vec_id"))
    cs.join(broadcast(ps), Seq("band_idx", "band_val"))
      .select(col("probe_id"), col("vec_id"), col("label"), col("embedding"), col("probe_emb"))
      .dropDuplicates("probe_id", "vec_id")
      .select(col("probe_id"), col("vec_id"), col("label"),
              r6(cosineNative(col("embedding"), col("probe_emb"))).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** Embedding-cosine near-duplicate pairs (north-star dedup family):
    * LSH bands generate candidates (hash join, no quadratic blowup), exact
    * cosine confirms against the threshold. Returns (id_a, id_b, sim)
    * with id_a < id_b. Recall is governed by planes/bandBits (more, finer
    * bands → higher recall, more candidates); exact duplicates always
    * collide in every band, so recall@sim=1 is 1.0.
    */
  def nearDupPairs(df: DataFrame, idCol: String, embCol: String,
                   threshold: Double, planes: Int = 16, bandBits: Int = 4): DataFrame = {
    val nBands = planes / bandBits
    val sig = df.select(col(idCol).as("id"), col(embCol).as("emb"))
      .withColumn("sig", lshSignature(col("emb"), planes))
      .withColumn("b", explode(array((0 until nBands).map { b =>
        struct(lit(b).as("band_idx"),
               pmod(shiftright(col("sig"), b * bandBits), lit(1L << bandBits)).as("band_val"))
      }: _*)))
      .select(col("id"), col("emb"), col("b.band_idx"), col("b.band_val"))
    sig.as("x").join(sig.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
              col("x.emb").as("ea"), col("y.emb").as("eb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("sim", r6(cosineNative(col("ea"), col("eb"))))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** SimHash of text tokens: 64-bit signature where bit b is the sign of
    * the sum over tokens of ±1 (from xxhash64(token) bit b). Near-dup
    * texts → small Hamming distance.
    */
  def simHash(textToks: Column, bits: Int = 16): Column = {
    val sums = (0 until bits).map { b =>
      val contrib = aggregate(textToks, lit(0.0),
        (acc, t) => acc +
          when(pmod(shiftright(xxhash64(t), b), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0)))
      when(contrib >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    sums.reduce(_ + _)
  }

  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("long")

  /** Engine-PORTABLE SimHash (q_dedup_simhash): bit b of the signature is
    * the sign of Σ_tokens ±1, where the ±1 comes from bit (b%4) of the
    * md5 hex digit at position 1+b/4 — nibble value recovered by ascii
    * arithmetic (md5 renders lowercase hex in every engine). `simHash`
    * above is the faster xxhash64 in-engine form; this one is
    * oracle-declarable because md5/ascii/shift agree across engines.
    */
  def simHashMd5(toks: Column, bits: Int = 16): Column = {
    val hs = transform(toks, t => md5(t))
    (0 until bits).map { b =>
      val pos = 1 + b / 4
      val shift = b % 4
      val contrib = aggregate(hs, lit(0L), (acc, h) => {
        val a = ascii(substring(h, pos, 1))
        val v = a - when(a <= 57, 48).otherwise(87)
        acc + when(pmod(shiftright(v, shift), lit(2)) === 1, 1L).otherwise(-1L)
      })
      when(contrib >= 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** q_vector_stats: per-dimension embedding statistics (count, mean,
    * min, max) — the normalization/whitening stats a training pipeline
    * computes before standardizing an embedding column, and the quickest
    * detector of dead or exploding dimensions. One posexplode + one
    * groupBy on the (tiny-cardinality) dimension index; partial aggs
    * carry all the reduction, so shuffled rows = dims × partitions — flat
    * in corpus size. Determinism: float32 → double casts are exact and
    * min/max are order-free; only the mean needs round-6 (double
    * summation order differs between engines).
    */
  /** q_embed_quant_int8: symmetric per-vector INT8 quantization audit —
    * the 4× footprint cut every 100 TB embedding store takes before ANN
    * serving (q = round(x·127/max|x|), dequant = q·max|x|/127). Declared
    * output: per-label vector count, mean reconstruction error, and the
    * exact zero / saturated code counts (dead-dimension and clipping
    * detectors). All map-side HOFs over the embedding array — no shuffle
    * before the label rollup; nothing collects.
    *
    * Determinism (§2.1): float→double casts are exact; the quant
    * expression keeps ONE operator order — round(x·127.0/max)·max/127.0 —
    * so both engines run identical IEEE ops per element; round() is
    * half-away-from-zero in both (Spark HALF_UP on BigDecimal, DuckDB
    * away-from-zero); |x| ≤ max ⇒ |q| ≤ 127, no clamp branch to diverge;
    * code counts are integers; the only cross-row double sum (label mean
    * of per-vector round-6 means) is absorbed by the final round-6.
    */
  def embedQuantQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.r6
    def xd(x: org.apache.spark.sql.Column) = x.cast("double")
    val e = Sources.embeddings(spark, dir)
      .withColumn("maxabs",
        aggregate(col("embedding"), lit(0.0), (a, x) => greatest(a, abs(xd(x)))))
      .filter(col("maxabs") > 0)
    def quant(x: org.apache.spark.sql.Column) =
      round(xd(x) * lit(127.0) / col("maxabs"))
    val perVec = e.select(
      col("label"),
      r6(aggregate(col("embedding"), lit(0.0), (a, x) =>
        a + abs(xd(x) - quant(x) * col("maxabs") / lit(127.0))) /
        size(col("embedding"))).as("err"),
      size(filter(col("embedding"), x => quant(x) === 0.0)).cast("long").as("n_zero"),
      size(filter(col("embedding"), x => abs(quant(x)) === 127.0)).cast("long").as("n_sat"))
    perVec.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
           r6(sum(col("err")) / count(lit(1))).as("avg_err"),
           sum(col("n_zero")).as("n_zero"),
           sum(col("n_sat")).as("n_sat"))
      .orderBy(col("label"))
  }

  def vectorStatsQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.Det.r6
    Sources.embeddings(spark, dir)
      .select(posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("dim").cast("long").as("dim"), col("xf").cast("double").as("x"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), r6(avg(col("x"))).as("mean"),
           min(col("x")).as("min_x"), max(col("x")).as("max_x"))
      .orderBy(col("dim"))
  }

  /** Coarse cluster assignment of the FULL embedding corpus against a
    * fixed centroid set — the partition/shuffle step of IVF indexing and
    * of SemDeDup-style semantic dedup. Centroids broadcast (k×dim is tiny
    * by construction); the corpus streams through one codegen'd cosine per
    * centroid and a per-vector argmax window partitioned by vec_id — no
    * corpus shuffle at all until the final k-row rollup. Determinism: the
    * argmax ranks the ROUNDED similarity with centroid-id tiebreak, so a
    * boundary can never flip between engines (§2.1).
    */
  def clusterAssign(e: DataFrame, k: Long): DataFrame =
    clusterAssignWith(e, e.filter(col("vec_id") < k)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cent_emb")))

  /** Assignment against an arbitrary (small) centroid frame. */
  def clusterAssignWith(e: DataFrame, cents: DataFrame): DataFrame = {
    val wA = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("centroid_id"))
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
              r6(cosineNative(col("embedding"), col("cent_emb"))).as("sim"))
      .withColumn("rn", row_number().over(wA))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("centroid_id"), col("sim"))
  }

  /** q_cluster_assign: per-cluster population profile of the coarse
    * assignment (k = 8 fixed centroids = vec_id 0..7): n members, min and
    * max assignment similarity — the balance/quality check run before
    * trusting an IVF index or a cluster-bucketed dedup pass. Counts are
    * integers and min/max of rounded doubles are order-free.
    */
  def clusterAssignQuery(spark: SparkSession, dir: String): DataFrame =
    clusterAssign(Sources.embeddings(spark, dir), 8)
      .groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n"), min(col("sim")).as("min_sim"), max(col("sim")).as("max_sim"))
      .orderBy(col("centroid_id"))

  /** q_kmeans: two fixed Lloyd rounds of k-means (k = 4, init = the
    * embeddings of vec_id 0..3) under the oracle gate — the clustering
    * primitive behind IVF index build and cluster-balanced data curation.
    * Fixed rounds (not convergence) for the same reason as q_pagerank: a
    * deterministic function of the data can hash-match an oracle.
    * Determinism per §2.1: assignments rank the ROUNDED cosine with
    * centroid-id tiebreak; the Lloyd update rounds each centroid
    * dimension (per-dim avg of exact float→double casts) to 6 dp in BOTH
    * engines, so the next round's inputs are bit-identical.
    *
    * Scale shape: centroids broadcast both rounds (k×dim is tiny); the
    * corpus never shuffles for assignment — only the per-dim update
    * aggregates shuffle, at dims × partitions rows (the q_vector_stats
    * bound, flat in corpus size). That IS distributed Lloyd at 100 TB.
    */
  def kmeansQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = Sources.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(eager = false) // consumed by init + both assignment rounds (lazy r12)
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("centroid_id"))
    // round 0 IS the coarse assignment — one ranking rule for every
    // assignment in this file (a determinism fix there applies here too)
    val a0 = clusterAssign(e, 4)
    // Lloyd update: per-dim rounded means, re-assembled in dim order
    val c1 = a0.select(col("centroid_id"), posexplode(col("embedding")).as(Seq("dim", "xf")))
      .groupBy(col("centroid_id"), col("dim"))
      .agg(r6(avg(col("xf").cast("double"))).as("m"))
      .groupBy(col("centroid_id"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
                     s => s.getField("m")).as("cent_emb"))
    val a1 = e.crossJoin(broadcast(c1))
      .select(col("vec_id"), col("centroid_id"),
              element_at(col("cent_emb"), 1).as("c0"),
              element_at(col("cent_emb"), 2).as("c1"),
              r6(cosineNative(col("embedding"), col("cent_emb"))).as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    a1.groupBy(col("centroid_id").as("cluster_id"), col("c0"), col("c1"))
      .agg(count(lit(1)).as("n"))
      .select(col("cluster_id"), col("n"), col("c0"), col("c1"))
      .orderBy(col("cluster_id"))
  }

  /** q_semantic_dedup: SemDeDup-shape near-duplicate mining over the FULL
    * corpus (Abbas et al. 2023: cluster the embeddings, then compare only
    * WITHIN clusters): pairs sharing a coarse cluster with rounded cosine
    * ≥ 0.3, rolled up per cluster (pair count, distinct vectors involved,
    * max similarity). The cluster equi-join is what makes this the 100 TB
    * shape — candidate pairs are Σ|cluster|² instead of |corpus|² — and
    * the cluster COUNT scales with the corpus (k = ⌈N/250⌉, the SemDeDup
    * recipe) so expected cluster size stays bounded and the pair stage
    * stays LINEAR in N; a fixed k measured 8.2x wall at 10x data (pairs
    * are quadratic in cluster size), the adaptive k is the fix. k is a
    * deterministic function of the data, so the key stays gateable — the
    * oracle twin computes the identical ⌈count/250⌉. The declared
    * semantics ARE the bucketed semantics — a cross-cluster near-dup is
    * invisible by design, exactly as in SemDeDup.
    */
  def semanticDedupQuery(spark: SparkSession, dir: String): DataFrame = {
    val e0 = Sources.embeddings(spark, dir)
    // k rides the dataflow as a broadcast 1-row scalar — no separate
    // count() job (which at 100 TB would be its own full pass)
    val kDf = e0.agg(expr("CAST(ceil(count(1) / 250.0) AS BIGINT)").as("k"))
    val cents = e0.crossJoin(broadcast(kDf))
      .filter(col("vec_id") < col("k"))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cent_emb"))
    val assign = clusterAssignWith(e0, cents)
      .select(col("centroid_id").as("cl"), col("vec_id"), col("embedding"))
      .localCheckpoint(eager = false) // both sides of the pair join + the member rollup (lazy r12)
    val pairs = assign.select(col("cl"), col("vec_id").as("a"), col("embedding").as("ea"))
      .join(assign.select(col("cl"), col("vec_id").as("b"), col("embedding").as("eb")), Seq("cl"))
      .filter(col("a") < col("b"))
      .select(col("cl"), col("a"), col("b"),
              r6(cosineNative(col("ea"), col("eb"))).as("sim"))
      .filter(col("sim") >= 0.3)
      .localCheckpoint(eager = false) // pair rollup + distinct-member rollup (lazy r12)
    val perCluster = pairs.groupBy(col("cl"))
      .agg(count(lit(1)).as("n_pairs"), max(col("sim")).as("max_sim"))
    val members = pairs.select(col("cl"), explode(array(col("a"), col("b"))).as("vec"))
      .distinct()
      .groupBy(col("cl")).agg(count(lit(1)).as("n_vecs"))
    perCluster.join(members, Seq("cl"))
      .select(col("cl").as("cluster_id"), col("n_pairs"), col("n_vecs"), col("max_sim"))
      .orderBy(col("cluster_id"))
  }
}

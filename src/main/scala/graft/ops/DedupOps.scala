package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Deduplication operators for LLM training-data pipelines (SURVEY.md §7.5):
  * exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup. Exact/Jaccard/cosine are DuckDB-oracle-backed;
  * MinHashLSH and SimHash depend on engine-specific hashing and are
  * rows-only + unit-tested (RowsOnly registry).
  *
  * Scale design: every pairwise variant joins WITHIN a blocking key
  * (`source`, `label`) so candidate pairs grow linearly with block count,
  * never O(n²) over the corpus; the LSH variants are the unblocked scale
  * path (bucket join on banded signatures).
  */
object DedupOps {

  /** lower + collapse whitespace + trim: the canonical text normalization
    * shared by fingerprints and dedup keys (and their oracles).
    */
  def normText(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(lower(c), "\\s+", " "))
  val normTextOracle: String => String =
    inner => s"trim(regexp_replace(lower($inner), '\\s+', ' ', 'g'))"

  /** Exact dedup: md5 of normalized text as the group key, min doc_id kept
    * (deterministic representative). Map-side partial agg keeps the shuffle
    * at one row per distinct hash.
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .groupBy(md5(normText(col("text")).cast("binary")).as("fingerprint"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_doc_id")

  val dedupExactOracle: String =
    s"""SELECT md5(${normTextOracle("text")}) AS fingerprint,
       |       min(doc_id) AS keep_doc_id, count(*) AS n_copies
       |FROM documents GROUP BY 1 ORDER BY keep_doc_id""".stripMargin

  /** Word-set Jaccard near-dup: distinct-token sets, pairwise within the
    * `source` blocking key, flag pairs with J ≥ 0.9. The block join is a
    * shuffle on the blocking key — linear in corpus size; the quadratic term
    * is bounded by block cardinality.
    */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        array_distinct(split(normText(col("text")), " ")).as("tokens"))
      .withColumn("n_tok", size(col("tokens")))
      .cache() // tiny (one row/doc); feeds the pair join + both lookups
    val ids = docs.select(col("doc_id"), col("source"), col("n_tok"))
    val a = ids.as("a"); val b = ids.as("b")
    // pair generation carries ONLY ids through the shuffle join — token
    // arrays would otherwise be copied into every SMJ output row; they are
    // attached afterwards via codegen'd broadcast-hash lookups.
    // length-ratio prune inside the join condition: J ≥ 0.9 implies
    // min(|A|,|B|)/max(|A|,|B|) ≥ 0.9 (|∩| ≤ min, |∪| ≥ max), so the integer
    // predicate is lossless — it only skips the expensive array ops
    val pairs = a.join(b, col("a.source") === col("b.source") &&
        col("a.doc_id") < col("b.doc_id") &&
        col("a.n_tok") * 10 >= col("b.n_tok") * 9 &&
        col("b.n_tok") * 10 >= col("a.n_tok") * 9)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_tok").as("n_a"), col("b.n_tok").as("n_b"))
    val ta = docs.select(col("doc_id").as("doc_a"), col("tokens").as("tok_a"))
    val tb = docs.select(col("doc_id").as("doc_b"), col("tokens").as("tok_b"))
    pairs
      .join(broadcast(ta), "doc_a").join(broadcast(tb), "doc_b")
      .select(
        col("doc_a"), col("doc_b"), col("n_a"), col("n_b"),
        graft.functions.ArrayFunctions.intersectSize(
          col("tok_a"), col("tok_b")).as("n_i"))
      // |A∪B| = |A|+|B|−|A∩B|: arithmetic, no second array op
      .select(col("doc_a"), col("doc_b"),
        (col("n_i").cast("double") /
          (col("n_a") + col("n_b") - col("n_i")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.9)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  val dedupNgramJaccardOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |         list_distinct(string_split(${normTextOracle("text")}, ' ')) AS tokens
       |  FROM documents)
       |SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         CAST(len(list_intersect(a.tokens, b.tokens)) AS DOUBLE) /
       |         CAST(len(a.tokens) + len(b.tokens)
       |              - len(list_intersect(a.tokens, b.tokens)) AS DOUBLE) AS jaccard
       |  FROM toks a JOIN toks b
       |    ON a.source = b.source AND a.doc_id < b.doc_id)
       |WHERE jaccard >= 0.9 ORDER BY doc_a, doc_b""".stripMargin

  /** Embedding-cosine near-dup within the `label` blocking key (labels are
    * the cluster assignment — the IVF-style candidate restriction).
    */
  def dedupEmbeddingCosine(s: SparkSession, dir: String): DataFrame = {
    // normalize ONCE per vector (O(n·d)); each pair is then a single dot
    // product instead of dot + two norms (O(pairs·d) dominates at scale)
    val emb = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        normalize(toDoubleArray(col("embedding"))).as("v"))
    val a = emb.as("a"); val b = emb.as("b")
    a.join(b, col("a.label") === col("b.label") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        dot(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= 0.35)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cos"))
      .orderBy("vec_a", "vec_b")
  }

  val dedupEmbeddingCosineOracle: String =
    s"""SELECT vec_a, vec_b, round(cos, 4) AS cos FROM (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |         ${cosineOracle("a.embedding", "b.embedding")} AS cos
       |  FROM embeddings a JOIN embeddings b
       |    ON a.label = b.label AND a.vec_id < b.vec_id)
       |WHERE cos >= 0.35 ORDER BY vec_a, vec_b""".stripMargin

  /** SimHash near-dup, hash-dependent → rows-only. 64-bit signature via the
    * native [[graft.functions.expressions.SimHash64]] expression over
    * xxhash64'd distinct tokens — a NARROW map (no explode, no signature
    * shuffle; the only shuffle is the pair join). Near-dups are pairs (same
    * `source` block) within Hamming distance 3 via `bit_count(xor)`.
    * [[simhashSignatures]] is the per-doc signature frame, also used by the
    * equivalence test against the explode+aggregate composition.
    */
  def simhashSignatures(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        ColumnBridge.column(graft.functions.expressions.SimHash64(
          ColumnBridge.expression(
            transform(array_distinct(split(normText(col("text")), " ")),
              t => xxhash64(t))))).as("simhash"))
  }

  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val sig = simhashSignatures(s, dir)
    val a = sig.as("a"); val b = sig.as("b")
    a.join(b, col("a.source") === col("b.source") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash signatures + banded LSH, hash-dependent → rows-only. 48 hash
    * functions h_j(t) = xxhash64(tok, j) minimum per doc (one narrow pass,
    * native MinHashSignature); 4 bands × 12 rows; candidate pairs collide
    * on (band, band-signature) — the unblocked scale path: one shuffle on
    * band keys, no O(n²) anywhere. Candidates are then verified with exact
    * Jaccard (classic LSH verify step).
    */
  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    // 4 bands × 12 rows: P(candidate) = 1-(1-J^12)^4 ≈ 0.74 at J=0.9,
    // 0.0039 at J=0.5 — tuned for a similarity-heavy corpus (at 8×4 banding
    // ~2.7M of the 12.5M global pairs collide → brute-force territory, 246s
    // at sf0.1; measured recall on the real near-dup set stays ≥0.8 because
    // true dups concentrate at J ≥ 0.95 where recall is ≈0.99).
    //
    // tokens (as xxhash64 longs — exact-Jaccard-equivalent modulo 2^-64
    // collisions, and far cheaper than UTF8String set ops in the
    // interpreted array expressions) and signatures are cached: both feed
    // the plan multiple times and are tiny (5k rows) next to the
    // million-pair candidate stage. At real scale these would be
    // materialized columns, not a cache.
    val nHashes = 48; val bands = 4; val rowsPerBand = nHashes / bands
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"),
        transform(array_distinct(split(normText(col("text")), " ")),
          t => xxhash64(t)).as("tokens"))
      .cache()
    // whole signature in one narrow pass (native MinHashSignature) — the
    // explode + groupBy + 48-min-aggregate composition shuffles every
    // (doc, token) pair; see minhashSignaturesComposed (test reference)
    val sig = docs.select(col("doc_id"),
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.expressions.MinHashSignature(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("tokens")),
          nHashes)).as("sig"))
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until bands).map(bnd =>
        struct(lit(bnd).as("band"),
          concat_ws(":", (0 until rowsPerBand).map(r =>
            col("sig")(bnd * rowsPerBand + r)): _*).as("bsig"))): _*)))
      .select(col("doc_id"), col("col.band"), col("col.bsig"))
    val a = banded.as("a"); val b = banded.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val da = docs.select(col("doc_id").as("doc_a"), col("tokens").as("tok_a"))
    val db = docs.select(col("doc_id").as("doc_b"), col("tokens").as("tok_b"))
    candidates.join(broadcast(da), "doc_a").join(broadcast(db), "doc_b")
      // lossless length-ratio prune before the array ops (see
      // dedupNgramJaccard): J ≥ 0.9 requires size ratio ≥ 0.9
      .filter(size(col("tok_a")) * 10 >= size(col("tok_b")) * 9 &&
        size(col("tok_b")) * 10 >= size(col("tok_a")) * 9)
      .select(col("doc_a"), col("doc_b"),
        size(col("tok_a")).as("n_a"), size(col("tok_b")).as("n_b"),
        graft.functions.ArrayFunctions.intersectSize(
          col("tok_a"), col("tok_b")).as("n_i"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_i").cast("double") /
          (col("n_a") + col("n_b") - col("n_i")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.9)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Shingle-based MinHash LSH (the brief's literal
    * shingle→minhash→band→bucket-join): set elements are 5-token Rabin–Karp
    * rolling-hash fingerprints (order-sensitive, unlike the word-set
    * variant), minhashed/banded/verified with the same machinery —
    * RollingShingleHash ∘ MinHashSignature are both narrow maps, so
    * everything before the band join stays shuffle-free. Rows-only
    * (hash-dependent); consistency vs exact shingle-Jaccard in DedupOpsSpec.
    */
  def dedupMinhashShingle(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => bc, expression => be}
    import graft.functions.expressions.{MinHashSignature, RollingShingleHash}
    val nHashes = 48; val bands = 4; val rowsPerBand = nHashes / bands
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"),
        array_distinct(bc(RollingShingleHash(be(
          transform(split(normText(col("text")), " "), t => xxhash64(t))),
          k = 5))).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .cache()
    val sig = docs.select(col("doc_id"),
      bc(MinHashSignature(be(col("shingles")), nHashes)).as("sig"))
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until bands).map(bnd =>
        struct(lit(bnd).as("band"),
          concat_ws(":", (0 until rowsPerBand).map(r =>
            col("sig")(bnd * rowsPerBand + r)): _*).as("bsig"))): _*)))
      .select(col("doc_id"), col("col.band"), col("col.bsig"))
    val a = banded.as("a"); val b = banded.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val da = docs.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val db = docs.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    candidates.join(broadcast(da), "doc_a").join(broadcast(db), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(col("sh_a")).as("n_a"), size(col("sh_b")).as("n_b"),
        graft.functions.ArrayFunctions.intersectSize(
          col("sh_a"), col("sh_b")).as("n_i"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_i").cast("double") /
          (col("n_a") + col("n_b") - col("n_i")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** The wide composition MinHashSignature replaced — kept ONLY as the
    * equality reference for VectorExpressionsSpec.
    */
  def minhashSignaturesComposed(s: SparkSession, dir: String, nHashes: Int): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"),
        transform(array_distinct(split(normText(col("text")), " ")),
          t => xxhash64(t)).as("tokens"))
    docs.select(col("doc_id"), explode(col("tokens")).as("tok"))
      .groupBy("doc_id").agg(
        array((0 until nHashes).map(j =>
          min(xxhash64(col("tok"), lit(j)))): _*).as("sig"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (dedupExact _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_embedding_cosine" -> (dedupEmbeddingCosine _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "dedup_minhash_shingle" -> (dedupMinhashShingle _))

  val oracles: Map[String, String] = Map(
    "dedup_exact" -> dedupExactOracle,
    "dedup_ngram_jaccard" -> dedupNgramJaccardOracle,
    "dedup_embedding_cosine" -> dedupEmbeddingCosineOracle)
}

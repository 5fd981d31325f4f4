package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication suite for training-data pipelines: exact, n-gram Jaccard,
  * MinHash (+ banded LSH), SimHash. Everything is expression-based (no
  * UDFs); hashes are explicit integer arithmetic (polyHash / affine rehash
  * mod 1e9+7), so results are engine-portable and unit-testable.
  *
  * Scale posture:
  *  - exact dedup = hash-groupBy: one shuffle on an 8/16-byte key;
  *  - n-gram similarity joins through an inverted shingle index (shuffle on
  *    shingle key) — never an O(n²) cross join;
  *  - MinHash/SimHash signatures are per-row expressions; LSH candidate
  *    generation shuffles only on (band, bandKey) buckets.
  */
object Dedup {
  import TextAnalysis.{polyHash, tokens, HashMod}

  /** k-word shingles (distinct), 1-based positions; callers must filter
    * docs with < k tokens (Spark's `sequence` would run backwards).
    */
  def shingles(text: Column, k: Int): Column = {
    val t = tokens(text)
    array_distinct(
      transform(sequence(lit(1), size(t) - (k - 1)),
        i => concat_ws(" ", slice(t, i, lit(k)))))
  }

  /** Exact-dup groups on an arbitrary key expression: one row per group with
    * the kept (minimum) id and the duplicate count.
    */
  def exactGroups(df: DataFrame, idCol: String, key: Column): DataFrame =
    df.groupBy(key.as("dup_key"))
      .agg(min(col(idCol)).as("kept_id"), count(lit(1)).as("n_dups"))

  /** INCREMENTAL exact dedup — the production shape: a delta batch arrives
    * against an already-deduplicated corpus, and each delta row must be
    * flagged against BOTH the corpus (`dup_of_corpus`) and earlier rows of
    * its own batch (`dup_in_delta`, keep-first by id). Re-deduplicating
    * corpus ∪ delta from scratch would rescan the full corpus per batch;
    * this touches the corpus once for its key set only.
    *
    * Scale shape: the corpus projects to its distinct key column (pruned
    * scan, one narrow distinct), the delta joins it on the key (shuffle on
    * an 8/32-byte key — the corpus side is large, so no broadcast), and
    * the within-delta check is a row_number window PARTITIONED BY KEY —
    * bounded by duplicate-group size, never a global window.
    */
  def incrementalExact(corpus: DataFrame, delta: DataFrame, idCol: String,
      key: Column): DataFrame = {
    val corpusKeys = corpus.select(key.as("__key")).distinct()
      .withColumn("__in_corpus", lit(true))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__key")).orderBy(col(idCol))
    delta.withColumn("__key", key)
      .join(corpusKeys, Seq("__key"), "left")
      .withColumn("__rn", row_number().over(w))
      .withColumn("dup_of_corpus", coalesce(col("__in_corpus"), lit(false)))
      .withColumn("dup_in_delta", col("__rn") > 1)
      .withColumn("keep", !col("dup_of_corpus") && !col("dup_in_delta"))
      .drop("__key", "__in_corpus", "__rn")
  }

  /** Incremental NEAR-dup admission — the banded-LSH counterpart of
    * [[incrementalExact]] (round 6): admit a delta batch against an
    * already-indexed corpus without rescanning corpus text. Inputs are
    * (id, sig) frames — the corpus side is the STORED signature index
    * (in production read back from parquet; MinHash signatures are the
    * index artifact the same way [[graft.ops.Sketches]] stores quantile
    * sketches). A delta doc is dropped when a banded-LSH bucket pairs it
    * with a corpus doc OR an earlier-id delta doc whose estimated
    * Jaccard clears `minEstJ` — the same greedy smaller-id-wins rule as
    * [[graft.ext.Similarity.semDedup]] (candidates, not survivors:
    * near-dup is not transitive, so greedy-by-id is the deterministic
    * contract). Returns one row per delta doc:
    * (id, keep, dup_of = smallest matching partner id, null if kept).
    *
    * Scale shape: band keys explode to `bands` rows per doc and the ONLY
    * shuffle is on (band, band_key) — corpus signatures are never
    * recomputed, corpus text is never read, and candidate verification
    * joins signatures by id (narrow frames). Per-bucket density bounds
    * the pair count exactly as in [[lshCandidates]].
    */
  def incrementalMinhash(corpusSigs: DataFrame, deltaSigs: DataFrame,
      idCol: String, bands: Int, minEstJ: Double): DataFrame =
    incrementalMinhashTagged(corpusSigs
      .select(col(idCol).cast("long").as("id"), col("sig"), lit(0).as("src"))
      .unionByName(deltaSigs
        .select(col(idCol).cast("long").as("id"), col("sig"), lit(1).as("src"))),
      bands, minEstJ)

  /** [[incrementalMinhash]] over a pre-tagged signature frame
    * (id LONG, sig, src 0=corpus/1=delta). Callers that derive BOTH
    * sides from one text pipeline (q499's admission chain) pass the
    * tagged union directly so the shingle-hash + n-min signature stage
    * appears ONCE in the plan instead of once per side (round-19
    * verdict task #5); `incrementalMinhash` above is now a shim that
    * builds the same tagged frame, so both entry points share one body
    * and one semantics. */
  def incrementalMinhashTagged(taggedSigs: DataFrame, bands: Int,
      minEstJ: Double): DataFrame = {
    val all = taggedSigs.transform(graft.core.CacheScope.scoped)
    val banded = all.select(col("id"), col("src"),
        posexplode(graft.functions.BandKeys.bandKeys(col("sig"), bands)))
      .select(col("id"), col("src"), col("pos").as("band"), col("col").as("bk"))
    val probe = banded.filter(col("src") === 1)
      .select(col("band"), col("bk"), col("id").as("id_d"))
    val index = banded
      .select(col("band"), col("bk"), col("id").as("id_p"), col("src").as("src_p"))
    val cand = probe.join(index, Seq("band", "bk"))
      .filter(col("src_p") === 0 || col("id_p") < col("id_d"))
      .select(col("id_d"), col("id_p")).distinct()
    val verified = cand
      .join(all.select(col("id").as("id_p"), col("sig").as("sig_p")), Seq("id_p"))
      .join(all.select(col("id").as("id_d"), col("sig").as("sig_d")), Seq("id_d"))
      .filter(estJaccard(col("sig_d"), col("sig_p")) >= minEstJ)
    val firstDup = verified.groupBy(col("id_d")).agg(min(col("id_p")).as("dup_of"))
    all.filter(col("src") === 1).select(col("id"))
      .join(firstDup.withColumnRenamed("id_d", "id"), Seq("id"), "left")
      .select(col("id"), col("dup_of").isNull.as("keep"), col("dup_of"))
  }

  /** Distinct-shingle inverted-index self-join → pairwise exact Jaccard.
    * Output: (id_a, id_b, inter, na, nb, jaccard) for id_a < id_b pairs
    * sharing ≥ 1 shingle.
    *
    * `maxShingleFreq` drops shingles shared by more than that many docs
    * before the self-join — the standard stop-shingle bound: a shingle in f
    * docs contributes f² pair rows, so one degenerate common shingle can
    * dominate the whole job at corpus scale. (Intersection counts lose those
    * shingles on BOTH sides consistently; at the harness scales the cap
    * never triggers — max observed freq is 25 at sf0.1.)
    */
  def jaccardPairs(docs: DataFrame, idCol: String, text: Column, k: Int,
      maxShingleFreq: Long = 1000L): DataFrame = {
    // Shingles participate as 8-byte poly hashes, not strings: the inverted
    // index shuffles longs (narrow exchange, cheap compares) and the shingle
    // construction is one codegen byte-pass. Hash collisions merge shingles
    // identically on both sides of any comparison (and in the mirrored
    // oracle), so counts stay consistent — the standard production trade.
    val withShs = docs.filter(size(tokens(text)) >= k)
      .select(col(idCol).as("id"),
        array_distinct(shingleHashes(text, k)).as("shs"))
    val sizes = withShs.select(col("id"), size(col("shs")).cast("long").as("nsh"))
    val shAll = withShs.select(col("id"), explode(col("shs")).as("sh"))
    val hot = shAll.groupBy(col("sh")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") > maxShingleFreq)
      .select(col("sh"))
    val sh = shAll.join(broadcast(hot), Seq("sh"), "left_anti")
    val a = sh.select(col("id").as("id_a"), col("sh"))
    val b = sh.select(col("id").as("id_b"), col("sh"))
    a.join(b, Seq("sh")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("nsh", "na"), Seq("id_a"))
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("nsh", "nb"), Seq("id_b"))
      .withColumn("jaccard", col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
  }

  /** Affine rehash h_i(x) = (x·a(i) + b(i)) mod M with a(i) = (2i+1)·K mod M
    * (odd-ish, scattered), b(i) = 40503·i + 1. All operands < 2^31 →
    * products < 2^62, no overflow.
    */
  def affine(i: Column, x: Column): Column = {
    val a = ((i * 2 + 1) * lit(2654435761L)) % lit(HashMod)
    val b = i * lit(40503L) + 1
    (x * a + b) % lit(HashMod)
  }

  /** MinHash signature from a PRE-MATERIALIZED shingle-hash array column.
    * Callers must bind `hashes` via withColumn (see [[shingleHashes]]) —
    * referencing the hash expression inline would make Catalyst re-evaluate
    * the whole shingle+hash pipeline once per signature component.
    * Backed by the codegen'd [[graft.functions.MinHashSig]] (one Java
    * double loop; the combinator form paid n·|shingles| interpreted lambda
    * calls per row) — same [[affine]] arithmetic, equivalence pinned in
    * DedupSpec.
    */
  def minhashFromHashes(hashes: Column, n: Int): Column =
    graft.functions.MinHashSig.minhashSig(hashes, n)

  /** Shingle polyhash array (bind once per row with withColumn). Backed by
    * the single-pass codegen expression [[graft.functions.ShingleHashes]]
    * (no token/shingle string allocation); duplicates are kept — MinHash
    * minima and band folds are multiset-insensitive, so results are
    * identical to hashing the distinct shingle set.
    */
  def shingleHashes(text: Column, k: Int): Column =
    graft.functions.ShingleHashes.shingleHashes(text, k)

  /** MinHash signature: n minima of affine-rehashed shingle polyhashes.
    * Convenience form; prefer binding [[shingleHashes]] to a column first
    * when the signature participates in further array ops.
    */
  def minhashSignature(text: Column, k: Int, n: Int): Column =
    minhashFromHashes(shingleHashes(text, k), n)

  /** Estimated Jaccard: fraction of equal signature components. */
  def estJaccard(sigA: Column, sigB: Column): Column =
    aggregate(zip_with(sigA, sigB, (a, b) => when(a === b, 1L).otherwise(0L)),
      lit(0L), _ + _).cast("double") / size(sigA)

  /** Banded-LSH candidate pairs: split the signature into `bands` bands of
    * r = n/bands values, key each band with an order-sensitive fold, and
    * join docs sharing any (band, key) bucket. Returns distinct id_a < id_b.
    */
  def lshCandidates(docs: DataFrame, idCol: String, sig: Column, bands: Int,
      sigLength: Int = 64): DataFrame = {
    // guard the band geometry up front: r=0 would fold every band over an
    // empty slice → one global bucket → O(n²) candidate explosion; a
    // non-dividing length silently drops trailing signature components
    require(sigLength % bands == 0 && sigLength / bands >= 1,
      s"signature length $sigLength must divide into $bands bands of >=1 rows")
    // band keys via the codegen'd fold (graft.functions.BandKeys — same
    // (acc·31+x) mod M arithmetic as the combinator form; equivalence
    // pinned in DedupSpec)
    val withSig = docs.select(col(idCol).as("id"), sig.as("sig"))
    val banded = withSig.select(col("id"),
      posexplode(graft.functions.BandKeys.bandKeys(col("sig"), bands)))
      .select(col("id"), col("pos").as("band"), col("col").as("band_key"))
    val a = banded.select(col("id").as("id_a"), col("band"), col("band_key"))
    val b = banded.select(col("id").as("id_b"), col("band"), col("band_key"))
    a.join(b, Seq("band", "band_key")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** 48-bit token hash for SimHash: two independent 24-bit chunks from the
    * poly hash and one affine rehash of it.
    */
  def hash48(t: Column): Column = {
    val h1 = polyHash(t)
    val h2 = (h1 * lit(48271L) + 11L) % lit(HashMod)
    (h1 % lit(1L << 24)) + (h2 % lit(1L << 24)) * lit(1L << 24)
  }

  /** Token hash48 array (bind once per row with withColumn before calling
    * [[simhashFromHashes]] — inline reuse re-evaluates per bit).
    */
  def tokenHashes48(text: Column): Column = transform(tokens(text), t => hash48(t))

  /** SimHash-48: each of 48 bits of each token hash votes ±1; result bit j
    * is set iff the vote sum is positive. Backed by the codegen'd
    * [[graft.functions.SimHash48]] expression (one Java loop per row; the
    * combinator form would run 48 interpreted lambda passes).
    */
  def simhashFromHashes(hs: Column): Column =
    graft.functions.SimHash48.simhash48(hs)

  /** Convenience: simhash48 straight from text (binds nothing — only use
    * when the result is consumed once).
    */
  def simhash48(text: Column): Column = simhashFromHashes(tokenHashes48(text))

  /** Hamming distance between two simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Connected components over an undirected pair list — the dedup DECISION
    * step: every near-dup cluster keeps exactly one representative (the
    * minimum id). Pregel-lite min-label propagation: each iteration joins
    * labels across edges and keeps the per-node minimum; converges in
    * O(log diameter) rounds for typical dup clusters (diameter ≤ 2-3).
    *
    * Scale: each round is one shuffle on node id; the driver only checks a
    * 1-row convergence aggregate per round (no data collected). `maxIter`
    * bounds pathological chains.
    *
    * @param pairs (id_a, id_b) undirected edges
    * @return (id, rep) for every node appearing in any edge
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .persist()
    // seed with min(id, min neighbor): this IS the first propagation round,
    // computed during init — one fewer join+shuffle round and one fewer
    // convergence check; the fixpoint is unchanged (monotone min-label)
    var labels = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("__mn"))
      .select(col("src").as("id"), least(col("__mn"), col("src")).as("rep"))
      .persist()
    // Convergence via an exact 1-row aggregate: labels only ever decrease,
    // so the (count, sum(rep)) pair is a monotone fingerprint — unchanged
    // iff the fixpoint is reached. Cheaper than a join-and-diff per round.
    def fingerprint(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)), sum(col("rep").cast("decimal(38,0)"))).collect()(0)
      (r.getLong(0), r.getDecimal(1))
    }
    var prev = fingerprint(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // candidate label for each node: min of own label and neighbors' labels
      val viaEdges = edges.join(labels, col("dst") === col("id"))
        .select(col("src").as("id"), col("rep"))
      val nextRaw = labels.select(col("id"), col("rep")).union(viaEdges)
        .groupBy(col("id")).agg(min(col("rep")).as("rep"))
      // Lineage truncation: each round stacks a join+union+agg on the prior
      // round's plan, so a long chain (diameter ~ maxIter) would carry a
      // 20-deep DAG into every action — planning cost alone kills a 100 TB
      // run. Every third round an eager localCheckpoint replaces the plan
      // with its materialized blocks; intermediate rounds persist as before.
      // (DedupSpec pins bounded plan depth on a diameter-12 chain.)
      val next =
        if (iter % 3 == 2) nextRaw.transform(graft.core.Ckpt.eager)
        else nextRaw.persist()
      val cur = fingerprint(next)
      labels.unpersist()
      labels = next
      converged = cur == prev
      prev = cur
      iter += 1
    }
    edges.unpersist()
    labels
  }
}

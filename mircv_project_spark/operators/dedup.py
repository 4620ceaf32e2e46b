"""Deduplication operators for large-scale training-data pipelines.

Four families, all DataFrame-native:

- exact:      hash-groupBy on normalized text (one shuffle on the hash)
- n-gram Jaccard: exact all-pairs similarity via shingle inverted join
              (the *verifier*; quadratic in bucket size — test/oracle
              path and the verify stage of LSH)
- MinHash + LSH: shingle -> minhash signature -> banded bucket join ->
              exact-Jaccard verification of candidates (the scale path:
              only docs sharing a band bucket are ever paired)
- SimHash:    64-bit near-dup fingerprint with Hamming-band blocking

Scale notes (10^12 rows): every operator is one or two shuffles on
hash-distributed keys, no driver-side state.  The LSH band join's key
cardinality is ~n_docs * bands, uniformly hash-distributed; hot buckets
(boilerplate shingle sets) are capped via bucket-size guard before the
quadratic pair expansion.  All hashes are md5-derived (hash60) so the
DuckDB oracle can restate every stage bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textnorm import grams_col, hash60_col, shingles_col, tokens_col

# MinHash parameters — pinned; the oracle SQL restates them.
# The permutation arithmetic stays inside signed 64-bit range in BOTH
# engines (no silent overflow / HUGEINT promotion divergence): shingle
# hashes are 28-bit (first 7 hex chars of md5), a,b < p = 2^31-1, so
# a*h < 2^59.
MINHASH_PERMS = 24
LSH_BANDS = 12  # rows per band = PERMS / BANDS = 2
MERSENNE_P = (1 << 31) - 1
MAX_BUCKET = 64  # guard: skip degenerate LSH buckets bigger than this


def _perm_params(i: int) -> tuple[int, int]:
    """Deterministic (a, b) for permutation i (odd a, both < p)."""
    a = ((2 * i + 1) * 0x9E3779B9) % MERSENNE_P
    b = ((i + 1) * 0x85EBCA6B) % MERSENNE_P
    return a | 1, b


def with_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("tokens", tokens_col(F.col(text_col)))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups over normalized text.
    -> (text_hash string, keep_id long, dup_count long): one row per
    distinct text, keep_id = lowest doc id (the canonical survivor)."""
    norm = F.concat_ws(" ", tokens_col(F.col(text_col)))
    return (
        docs.select(F.md5(norm).alias("text_hash"), F.col(id_col).cast("long").alias("id"))
        .groupBy("text_hash")
        .agg(F.min("id").alias("keep_id"), F.count("*").alias("dup_count"))
    )


def shingle_sets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """-> (id, shingle) exploded distinct n-gram shingles.

    tokens materialize into their own projection first: feeding the
    tokenizer expression tree straight into shingles_col would inline
    it once per n-gram position and Catalyst re-evaluates the regex
    pipeline per access (~10x slower at 5k docs; worse with doc
    length)."""
    toks = docs.select(
        F.col(id_col).cast("long").alias("id"),
        tokens_col(F.col(text_col)).alias("tokens"),
    )
    return toks.select(
        "id", F.explode(shingles_col(F.col("tokens"), n)).alias("shingle")
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs (id_a < id_b, jaccard >= t).
    -> (id_a, id_b, jaccard double rounded to 6).

    Inverted shingle join: only docs sharing >= 1 shingle are paired
    (never a full cross join), intersection counted by one groupBy on
    the pair key.  Quadratic in per-shingle df — the scale path runs
    minhash_lsh_pairs and uses this only to verify its candidates.
    """
    # shingling (tokenize + explode) feeds three branches (sizes + both
    # join sides) — persist so it is computed once.  MEMORY_AND_DISK:
    # at scale this is the materialized shingle index; spilling beats
    # recomputing the tokenizer.
    sh = shingle_sets(docs, id_col, text_col, n).persist()
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .where(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


def _signatures_from_shingles(sh: DataFrame, perms: int) -> DataFrame:
    """(id, shingle) rows -> (id, sig array<long>[perms]).  The ONE
    copy of the pinned permutation arithmetic (28-bit md5 shingle hash,
    (a*h % p + b) % p, p = 2^31-1 — must stay within signed 64-bit, see
    MERSENNE_P note) shared by minhash_signatures and
    minhash_lsh_pairs so the two cannot drift from the oracle SQL."""
    hashed = sh.withColumn(
        "h", F.conv(F.substring(F.md5(F.col("shingle")), 1, 7), 16, 10).cast("long")
    )
    mins = [
        F.min((F.lit(a) * F.col("h") % MERSENNE_P + F.lit(b)) % MERSENNE_P).alias(f"m{i}")
        for i, (a, b) in enumerate(_perm_params(i) for i in range(perms))
    ]
    agg = hashed.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[f"m{i}" for i in range(perms)]).alias("sig"))


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    perms: int = MINHASH_PERMS,
) -> DataFrame:
    """-> (id, sig array<long>[perms]): minhash over md5-derived 28-bit
    shingle hashes with (a*h % p + b) % p permutations, p = 2^31-1.
    Docs with zero shingles are dropped (no signature)."""
    return _signatures_from_shingles(shingle_sets(docs, id_col, text_col, n), perms)


def lsh_band_rows(
    sh: DataFrame, perms: int = MINHASH_PERMS, bands: int = LSH_BANDS
) -> DataFrame:
    """(id, shingle) -> (id, band, bkey): the ONE copy of the
    signature + banding derivation (md5 over the band's concatenated
    minhash rows), shared by the batch LSH join and the streaming
    near-dup store so the two cannot drift."""
    r = perms // bands
    sig = _signatures_from_shingles(sh, perms)
    return sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "_", *[F.col("sig")[bi * r + j] for j in range(r)]
                            )
                        ).alias("bkey"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bkey")


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    perms: int = MINHASH_PERMS,
    bands: int = LSH_BANDS,
    max_bucket: int = MAX_BUCKET,
    metrics: dict | None = None,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verification.

    Banding: signature split into `bands` bands of perms/bands rows;
    docs agreeing on any whole band share a bucket.  With 12 bands x 2
    rows, P(candidate | j) = 1-(1-j^2)^12 — >0.9999 at j>=0.8, so on
    corpora whose near-dups sit at j>=0.8 the verified output equals
    exact jaccard_pairs (tests assert this; the oracle uses the exact
    computation).  Buckets larger than max_bucket are dropped before
    pair expansion (boilerplate guard); pass ``metrics={}`` to record
    how many buckets/rows that cap discarded (no-silent-caps rule) —
    the count costs one extra aggregate job, so it is on request only.
    """
    # one shingle derivation reused by signature, candidate-verify and
    # size branches (persisted; see jaccard_pairs note)
    sh = shingle_sets(docs, id_col, text_col, n).persist()
    band_rows = lsh_band_rows(sh, perms, bands)

    # band_rows feeds the bucket-size agg AND both sides of the
    # candidate self-join: persist (n_docs x bands small rows).
    band_rows = band_rows.persist()
    sizes = band_rows.groupBy("band", "bkey").agg(F.count("*").alias("bs"))
    if metrics is not None:
        row = (
            sizes.where(F.col("bs") > max_bucket)
            .agg(F.count("*"), F.sum("bs"))
            .collect()[0]
        )
        metrics["dropped_buckets"] = int(row[0] or 0)
        metrics["dropped_rows"] = int(row[1] or 0)
    pruned = band_rows.join(
        sizes.where(F.col("bs") <= max_bucket), ["band", "bkey"]
    ).persist()
    a = pruned.alias("a")
    b = pruned.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    # exact verification of candidates only (reuses the persisted sh)
    sizes_doc = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    ea = sh.select(F.col("id").alias("id_a"), "shingle")
    eb = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        cand.join(ea, "id_a")
        .join(eb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(sizes_doc.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na")), "id_a")
        .join(sizes_doc.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb")), "id_b")
        .where(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


def dup_components(
    pairs: DataFrame, max_iterations: int = 25
) -> DataFrame:
    """Connected components over near-duplicate pairs -> canonical
    cluster labels: (id long, component long) where component = the
    MINIMUM id reachable through the pair graph (the survivor a dedup
    pipeline keeps).  Only ids that appear in pairs are returned —
    singletons are trivially their own component.

    Iterative min-label propagation (Pregel-lite as DataFrame joins):
    each round every node takes min(own label, neighbors' labels), then
    POINTER-JUMPS once (label <- label's label — a self-join on the
    label column; sound because a label is always a node id in the same
    component and labels only decrease), so convergence needs
    O(log diameter) rounds instead of O(diameter) — a 30-node path
    converges in ~5 rounds, and dedup's shallow near-cliques still
    finish in 2-3.  The loop stops when a round changes nothing
    (checked via an aggregate, not a collect of the data).  Each round
    is a bounded number of shuffles on id; labels localCheckpoint per
    round — persist alone is NOT enough here, because each round's
    LOGICAL plan still embeds all previous rounds' plans and Catalyst
    planning time compounds per round (measured: 1.5s -> 5s -> 60s per
    round at a 100-node graph before the checkpoint cut).
    max_iterations caps pathological cases; an incomplete propagation
    raises rather than returning wrong labels.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()  # eager; truncates the plan per round
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nmin"))
        )
        stepped = labels.join(
            neighbor_min, labels.id == neighbor_min.src, "left"
        ).select(
            "id",
            F.least(
                F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
            ).alias("component"),
        ).localCheckpoint()
        # pointer jump: follow the label one hop (label is itself a
        # node id in the same component, so this only shortcuts chains)
        lookup = stepped.select(
            F.col("id").alias("lid"), F.col("component").alias("lcomp")
        )
        new_labels = (
            stepped.join(lookup, stepped.component == lookup.lid, "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("lcomp"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        edges.unpersist()
        raise RuntimeError(
            f"dup_components did not converge in {max_iterations} rounds"
        )
    edges.unpersist()
    return labels


def dedup_keep_list(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """End-to-end near-dup removal decision: (id long, keep boolean,
    component long) for EVERY doc — keep = the doc is its cluster's
    minimum id (singletons keep themselves, component = own id).  This
    is the operator a training-data pipeline actually applies after
    pair generation; feed it minhash_lsh_pairs / embedding near-dup
    pairs."""
    comp = dup_components(pairs)
    ids = docs.select(F.col(id_col).cast("long").alias("id"))
    return (
        ids.join(comp, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("component"), F.col("id")).alias("component"),
        )
        .withColumn("keep", F.col("id") == F.col("component"))
        .select("id", "keep", "component")
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 60) -> DataFrame:
    """-> (id, simhash long): tf-weighted sign-sum over md5-derived
    token hash bits (60 bits so the value stays oracle-computable in
    DuckDB via the same '0x'+md5 parse).  Ties (sum == 0) resolve to
    bit 0, matching the SQL restatement."""
    toks = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    h = tf.withColumn("h", hash60_col(F.col("term")))
    bit_sums = h.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, F.col("tf"))
                .otherwise(-F.col("tf"))
            ).alias(f"s{b}")
            for b in range(bits)
        ]
    )
    val = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(2 ** b).cast("long")).otherwise(F.lit(0).cast("long"))
        val = term if val is None else (val + term)
    return bit_sums.select("id", val.alias("simhash"))


DUPSPAN_N = 4


def dup_span_stats(
    docs: DataFrame,
    n: int = DUPSPAN_N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, n_tokens, n_spans, dup_tokens, dup_ratio): exact
    duplicated-substring coverage per document, the fixed-width
    distributed form of Lee et al. 2021's suffix-array substring dedup
    ("Deduplicating Training Data Makes Language Models Better"): a
    token position is duplicated iff the n-gram window starting there
    occurs >= 2 times CORPUS-WIDE (counting every position, including
    repeats inside the same document); overlapping or adjacent windows
    merge into maximal spans (gaps-and-islands: break only on a strict
    gap, pos > prev_max_end + 1); dup_tokens = total tokens covered by
    merged spans, dup_ratio = round(dup_tokens / n_tokens, 6).

    Everything but the final ratio is exact integer arithmetic.  Docs
    with zero tokens emit no row; docs shorter than n tokens emit
    (n_spans=0, dup_tokens=0).  Pinned gate params: n = 4 (multi-span
    structure on the driver corpora — larger n collapses to all-or-
    nothing whole-doc dups); the oracle restates window construction,
    the >= 2 corpus-wide rule, and the island break verbatim.

    Scale shape (100 TB): one tokenizer pass into a persisted
    (id, n_tokens, grams) projection; the position stream is persisted
    once and consumed by the two stages that define the operator — the
    corpus-wide gram-count aggregation (map-side combined; this IS the
    job, same shuffle class as exact dedup) and the gram-keyed semi-
    join marking duplicated positions.  The island merge windows over
    per-doc positions only (partition = doc, never corpus-wide).
    Boilerplate-gram skew is AQE skew-join territory, same as lm.py's
    stopword bigrams.
    """
    from pyspark.sql import Window

    staged = docs.select(
        F.col(id_col).cast("long").alias("id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    tg = (
        staged.select(
            "id",
            F.size("toks").alias("n_tokens"),
            grams_col(F.col("toks"), n).alias("grams"),
        )
        .where(F.col("n_tokens") > 0)
        .persist()
    )
    try:
        gp = tg.select(
            "id", F.posexplode("grams").alias("pos0", "gram")
        ).persist()
        try:
            dup = (
                gp.groupBy("gram")
                .agg(F.count("*").alias("c"))
                .where(F.col("c") >= 2)
                .select("gram")
            )
            hits = gp.join(dup, "gram").select(
                "id",
                (F.col("pos0") + 1).alias("pos"),
                (F.col("pos0") + n).alias("e"),
            )
            w = Window.partitionBy("id").orderBy("pos")
            prev_e = F.max("e").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            )
            brk = F.when(
                F.col("pos") > F.coalesce(prev_e, F.lit(-1)) + 1, 1
            ).otherwise(0)
            isl = hits.select("id", "pos", "e", brk.alias("brk"))
            grp = isl.select(
                "id",
                "pos",
                "e",
                F.sum("brk")
                .over(w.rowsBetween(Window.unboundedPreceding, 0))
                .alias("g"),
            )
            spans = grp.groupBy("id", "g").agg(
                F.min("pos").alias("s"), F.max("e").alias("e")
            )
            perdoc = spans.groupBy("id").agg(
                F.count("*").alias("n_spans"),
                F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"),
            )
            dupt = F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long")
            out = (
                tg.select("id", "n_tokens")
                .join(perdoc, "id", "left")
                .select(
                    "id",
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.coalesce(F.col("n_spans"), F.lit(0))
                    .cast("long")
                    .alias("n_spans"),
                    dupt.alias("dup_tokens"),
                    F.round(
                        dupt.cast("double")
                        / F.col("n_tokens").cast("double"),
                        6,
                    ).alias("dup_ratio"),
                )
                .localCheckpoint()
            )
        finally:
            gp.unpersist()
    finally:
        tg.unpersist()
    return out


def jaccard_pairs_prefix(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via PREFIX FILTERING
    (Chaudhuri et al. 2006 / PPJoin, Xiao et al. 2008) — identical
    output to `jaccard_pairs` (same oracle by design), different
    candidate generation: the EXACT scale path where `jaccard_pairs`'
    full inverted-shingle join is quadratic in per-shingle df and
    `minhash_lsh_pairs` trades recall for pruning.

    Principle: order every doc's shingles by a global canonical order
    (df asc, shingle asc — rarest first).  For J(x, y) >= t the
    intersection has >= ceil(t*|x|) elements, so if x and y share NO
    element within their first  p = |set| - ceil(t*|set|) + 1
    elements, the intersection fits in the last ceil(t*|set|) - 1 <
    t*|set| elements — contradiction.  Candidates = pairs sharing >= 1
    PREFIX shingle on BOTH sides; recall is exactly 1, and because the
    prefix holds the globally rarest shingles, candidate df is far
    below full-join df.  The exact per-pair verify (one
    array_intersect over the collected shingle sets) only discards.

    The prefix length uses ceil(t*n - 1e-9): the epsilon guards the
    non-dyadic t*n float landing a hair ABOVE an exact integer (which
    would shorten the prefix and break recall); landing below only
    lengthens it — more candidates, still exact.

    Scale shape (100 TB): shingle df counts and the per-doc rank are
    one agg + one bounded window; the candidate join touches prefix
    rows only; the verify joins candidate pairs (not the corpus) to the
    per-doc shingle arrays.
    """
    sh = shingle_sets(docs, id_col, text_col, n).persist()
    try:
        dfc = sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
        w = Window.partitionBy("id").orderBy(
            F.col("sdf").asc(), F.col("shingle").asc()
        )
        ranked = (
            sh.join(dfc, "shingle")
            .withColumn("r", F.row_number().over(w))
            .withColumn("n_sh", F.count("*").over(Window.partitionBy("id")))
        )
        plen = (
            F.col("n_sh")
            - F.ceil(F.lit(threshold) * F.col("n_sh") - F.lit(1e-9))
            + 1
        )
        prefix = ranked.where(F.col("r") <= plen).select("id", "shingle")
        cand = (
            prefix.alias("a")
            .join(
                prefix.alias("b"),
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(
                F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
            )
            .distinct()
        )
        sets = sh.groupBy("id").agg(F.collect_set("shingle").alias("ss"))
        verified = (
            cand.join(
                sets.select(F.col("id").alias("id_a"), F.col("ss").alias("sa")),
                "id_a",
            )
            .join(
                sets.select(F.col("id").alias("id_b"), F.col("ss").alias("sb")),
                "id_b",
            )
            .withColumn(
                "inter", F.size(F.array_intersect("sa", "sb")).cast("long")
            )
            .withColumn(
                "jac",
                F.col("inter")
                / (F.size("sa") + F.size("sb") - F.col("inter")),
            )
            .where(F.col("jac") >= threshold)
            .select("id_a", "id_b", F.round("jac", 6).alias("jaccard"))
        )
        out = verified.localCheckpoint()
    finally:
        sh.unpersist()
    return out


CONTAIN_T_NUM = 4  # containment threshold 4/5 = 0.8, compared in
CONTAIN_T_DEN = 5  # cross-multiplied integers (no float boundary)


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Asymmetric near-duplicate detection: containment(a in b) =
    |S_a ∩ S_b| / |S_a| over distinct n-gram shingles (Broder 1997's
    second resemblance measure) — catches quotations, excerpts, and
    subset documents that symmetric Jaccard misses when the lengths
    differ (a short doc fully inside a long one has low Jaccard but
    containment 1).  ORDERED pairs (id_a != id_b): a in b is not
    b in a.

    Pins (restated in oracle._CONTAINMENT_SQL — change both sides or
    neither): shingles = the shared 3-gram derivation of the Jaccard
    gates, threshold = CONTAIN_T_NUM/CONTAIN_T_DEN compared as
    CONTAIN_T_DEN * inter >= CONTAIN_T_NUM * n_a (pure integers — a
    float ratio compare could drift at the boundary), containment
    reported round 6.  -> (id_a, id_b, inter, n_a, containment).

    Scale shape: same inverted shared-shingle join as jaccard_pairs
    (exact: containment > 0 requires a shared shingle) — quadratic in
    per-shingle df, so at scale this is the verify stage behind a
    MinHash/LSH blocker exactly like the symmetric path."""
    sh = shingle_sets(docs, id_col, text_col, n).persist()
    try:
        sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
        a, b = sh.alias("a"), sh.alias("b")
        inter = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.id") != F.col("b.id")),
            )
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count("*").alias("inter"))
        )
        out = (
            inter.join(
                sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a")),
                "id_a",
            )
            .where(
                F.lit(CONTAIN_T_DEN) * F.col("inter")
                >= F.lit(CONTAIN_T_NUM) * F.col("n_a")
            )
            .select(
                "id_a",
                "id_b",
                F.col("inter").cast("long").alias("inter"),
                F.col("n_a").cast("long").alias("n_a"),
                F.round(
                    F.col("inter").cast("double") / F.col("n_a").cast("double"),
                    6,
                ).alias("containment"),
            )
            .localCheckpoint()
        )
    finally:
        sh.unpersist()
    return out

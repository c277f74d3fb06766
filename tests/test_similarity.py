"""Embedding near-dup: banded sign-LSH vs exact all-pairs."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.default_rng(7)
    rows, vid = [], 0
    for _ in range(300):
        rows.append((vid, [float(x) for x in rng.normal(size=32)]))
        vid += 1
    for _ in range(20):  # 20 planted near-dup pairs (cosine ≈ 0.999)
        v = rng.normal(size=32)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
        rows.append(
            (vid, [float(x) for x in (v + rng.normal(size=32) * 0.01)])
        )
        vid += 1
    return spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    ).cache()


def test_banded_lsh_finds_planted_dups(spark, planted):
    from babylon_data_loader_spark.operators.similarity import (
        embedding_dup_pairs,
    )

    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_dup_pairs(planted, 0.98, exact=True).collect()
    }
    assert len(exact) == 20  # all planted, no random collisions
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_dup_pairs(
            planted, 0.98, n_planes=8, n_bands=4
        ).collect()
    }
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.9, f"recall {recall}"
    # verification step keeps precision exact: every emitted pair truly
    # clears the threshold
    assert lsh <= exact


def test_lsh_no_false_pairs_on_random(spark, planted):
    from babylon_data_loader_spark.operators.similarity import (
        embedding_dup_pairs,
    )

    # raise the bar: at 0.999 only the tightest planted pairs survive,
    # and nothing random does
    out = embedding_dup_pairs(planted, 0.9999, n_planes=8, n_bands=4).collect()
    for r in out:
        assert r["sim"] >= 0.9999

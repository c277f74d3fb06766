"""Commit-backend contract: both backends must give the three
guarantees the lake's commit protocol rests on (publish atomicity is
OS/store-level; exclusive create and single-winner removal are
testable here). No Spark needed."""

from __future__ import annotations

import os
import threading
import time

import pytest

from babylon_data_loader_spark.operators.commit_backend import (
    ObjectStoreCommitBackend,
    PosixCommitBackend,
    PreconditionFailed,
)


class FakeObjectClient:
    """In-memory object store with S3-style conditional writes:
    If-None-Match:* create and If-Match:<etag> replace, both atomic
    under a lock like a real store's per-key serialization."""

    def __init__(self) -> None:
        self._objects: dict[str, tuple[str, str, float]] = {}
        self._lock = threading.Lock()
        self._gen = 0

    def put(self, key, payload, if_none_match=False, if_match=None):
        with self._lock:
            existing = self._objects.get(key)
            if if_none_match and existing is not None:
                raise PreconditionFailed(key)
            if if_match is not None and (
                existing is None or existing[1] != if_match
            ):
                raise PreconditionFailed(key)
            self._gen += 1
            etag = f"etag-{self._gen}"
            self._objects[key] = (payload, etag, time.time())
            return etag

    def head(self, key):
        obj = self._objects.get(key)
        if obj is None:
            return None
        return {"etag": obj[1], "last_modified": obj[2]}

    def get(self, key):
        obj = self._objects.get(key)
        if obj is None:
            raise FileNotFoundError(key)
        return obj[0]

    def delete(self, key):
        self._objects.pop(key, None)


@pytest.fixture(params=["posix", "object_store"])
def backend(request, tmp_path):
    if request.param == "posix":
        return PosixCommitBackend(), str(tmp_path)
    return ObjectStoreCommitBackend(FakeObjectClient()), "bucket/prefix"


def test_publish_then_read_roundtrip(backend):
    be, root = backend
    key = os.path.join(root, "_CURRENT")
    be.publish(key, "v1.json")
    assert be.read(key) == "v1.json"
    be.publish(key, "v2.json")
    assert be.read(key) == "v2.json"
    assert be.exists(key)
    assert not be.exists(os.path.join(root, "nope"))


def test_create_exclusive_single_winner(backend):
    be, root = backend
    key = os.path.join(root, "v7.json")
    assert be.create_exclusive(key, "A") is True
    assert be.create_exclusive(key, "B") is False
    assert be.read(key) == "A"  # loser did not clobber
    age, token = be.observe(key)
    assert age >= 0.0 and token is not None
    assert be.observe(os.path.join(root, "missing")) is None


def test_remove_exclusive_single_winner(backend):
    be, root = backend
    key = os.path.join(root, "v7.json")
    be.create_exclusive(key, "stale-writer")
    first = be.remove_exclusive(key)
    second = be.remove_exclusive(key)
    assert (first, second) == (True, False)
    assert not be.exists(key)


def test_takeover_cannot_delete_winners_recreated_claim(backend):
    """The TOCTOU the old remove+recreate protocol had: takers T1 and
    T2 both observe the same stale claim; T1 removes it and re-creates
    it; T2's fenced removal with its OLD token must fail — and must
    leave T1's fresh claim in place."""
    be, root = backend
    key = os.path.join(root, "v9.json")
    be.create_exclusive(key, "stale")
    _, stale_token = be.observe(key)
    # T1 wins takeover and immediately re-claims
    assert be.remove_exclusive(key, token=stale_token) is True
    assert be.create_exclusive(key, "taker-1") is True
    # T2 still holds the stale generation's token: it must lose.
    assert be.remove_exclusive(key, token=stale_token) is False
    assert be.read(key) == "taker-1"
    assert be.exists(key)


def test_concurrent_removals_exactly_one_winner(backend):
    be, root = backend
    key = os.path.join(root, "race.json")
    be.create_exclusive(key, "stale")
    wins = []
    barrier = threading.Barrier(8)

    def attempt():
        barrier.wait()
        wins.append(be.remove_exclusive(key))

    threads = [threading.Thread(target=attempt) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert wins.count(True) == 1

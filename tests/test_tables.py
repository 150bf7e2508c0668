"""Catalog MOR (merge-on-read) upsert semantics: O(delta) writes, latest-wins
reads, compaction equivalence, and interplay with the atomic round-commit
protocol (≙ Iceberg MERGE INTO with merge-on-read + maintenance compaction;
the reference's analog is PostgreSQL in-place UPDATE, which is also O(touched
rows) — /root/reference/crawlers/github.go:475-516)."""

import json
import os

import pytest

from crawld_spark.sources.tables import Catalog


def rows(df):
    return sorted((r.k, r.v) for r in df.collect())


def mk(spark, data):
    return spark.createDataFrame(data, "k int, v string")


@pytest.mark.usefixtures("spark")
class TestUpsert:
    def test_insert_then_update_latest_wins(self, spark, warehouse):
        cat = Catalog(spark, warehouse)
        cat.write("t", mk(spark, [(1, "a"), (2, "b")]))
        cat.upsert("t", updates=mk(spark, [(2, "B"), (3, "c")]), keys=["k"])
        assert rows(cat.read("t")) == [(1, "a"), (2, "B"), (3, "c")]
        # second layer: later delta wins over earlier delta AND base
        cat.upsert("t", updates=mk(spark, [(3, "C")]), inserts=mk(spark, [(4, "d")]),
                   keys=["k"])
        assert rows(cat.read("t")) == [(1, "a"), (2, "B"), (3, "C"), (4, "d")]

    def test_write_cost_is_o_delta(self, spark, warehouse):
        """An upsert must not rewrite base files: the data dirs present
        before the upsert are byte-identical after it."""
        cat = Catalog(spark, warehouse)
        cat.write("t", mk(spark, [(i, "x") for i in range(100)]))
        m0 = cat._read_manifest("t", cat.current_version("t"))
        before = {
            d: sorted(os.listdir(os.path.join(warehouse, "t", d)))
            for d in m0["data_dirs"]
        }
        cat.upsert("t", updates=mk(spark, [(5, "y")]), keys=["k"])
        m1 = cat._read_manifest("t", cat.current_version("t"))
        assert m0["data_dirs"] == m1["data_dirs"][: len(m0["data_dirs"])]
        for d, files in before.items():
            assert sorted(os.listdir(os.path.join(warehouse, "t", d))) == files
        assert len(m1["delta_dirs"]) == 1

    def test_compaction_preserves_state(self, spark, warehouse):
        cat = Catalog(spark, warehouse)
        cat.compact_after = 3
        cat.write("t", mk(spark, [(1, "a"), (2, "b")]))
        expect = {1: "a", 2: "b"}
        for i in range(6):
            upd = [(1 + (i % 2), f"v{i}")]
            expect[1 + (i % 2)] = f"v{i}"
            cat.upsert("t", updates=mk(spark, upd), inserts=mk(spark, [(10 + i, "n")]),
                       keys=["k"])
            expect[10 + i] = "n"
        m = cat._read_manifest("t", cat.current_version("t"))
        assert len(m["delta_dirs"]) <= cat.compact_after  # compaction fired
        assert rows(cat.read("t")) == sorted(expect.items())

    def test_merge_delegates_to_mor(self, spark, warehouse):
        """merge(): matched → replaced, unmatched → inserted, O(delta)."""
        cat = Catalog(spark, warehouse)
        cat.write("t", mk(spark, [(1, "a"), (2, "b")]))
        cat.merge("t", mk(spark, [(2, "B2"), (9, "i")]), keys=["k"])
        assert rows(cat.read("t")) == [(1, "a"), (2, "B2"), (9, "i")]
        m = cat._read_manifest("t", cat.current_version("t"))
        assert len(m["delta_dirs"]) == 1  # no base rewrite

    def test_staged_upsert_respects_rollback(self, spark, warehouse):
        """A staged (advance_pointer=False) upsert is invisible until commit
        and rolls back cleanly — the round-commit discipline holds for MOR
        writes too (≙ success-only checkpointing, crawld.go:236-239)."""
        cat = Catalog(spark, warehouse)
        v1 = cat.write("t", mk(spark, [(1, "a")]), advance_pointer=False)
        cat.commit_round(0, {"t": v1})
        v2 = cat.upsert("t", updates=mk(spark, [(1, "A")]), keys=["k"],
                        advance_pointer=False)
        # not committed: reads still see round 0
        assert rows(cat.read("t")) == [(1, "a")]
        cat.commit_round(1, {"t": v2})
        assert rows(cat.read("t")) == [(1, "A")]
        # crash after a staged-but-uncommitted v3 → restore sees round 1
        cat.upsert("t", updates=mk(spark, [(1, "ghost")]), keys=["k"],
                   advance_pointer=True)
        assert cat.restore_last_commit() == 1
        assert rows(cat.read("t")) == [(1, "A")]

    def test_append_preserves_delta_layers(self, spark, warehouse):
        cat = Catalog(spark, warehouse)
        cat.write("t", mk(spark, [(1, "a")]))
        cat.upsert("t", updates=mk(spark, [(1, "A")]), keys=["k"])
        cat.append("t", mk(spark, [(2, "b")]))
        assert rows(cat.read("t")) == [(1, "A"), (2, "b")]

    def test_manifest_format(self, spark, warehouse):
        cat = Catalog(spark, warehouse)
        cat.upsert("t", inserts=mk(spark, [(1, "a")]), updates=mk(spark, [(1, "A")]),
                   keys=["k"])
        with open(cat._manifest_path("t", cat.current_version("t"))) as f:
            m = json.load(f)
        assert m["keys"] == ["k"]
        assert len(m["data_dirs"]) == 1 and len(m["delta_dirs"]) == 1
        assert rows(cat.read("t")) == [(1, "A")]

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


def mks(spark, data):
    return spark.createDataFrame(data, "k int, v string, status string")


def rows3(df):
    return sorted((r.k, r.v, r.status) for r in df.collect())


@pytest.mark.usefixtures("spark")
class TestPartitionPruning:
    """Iceberg partition-spec stand-in: manifest-tagged base dirs + pruned
    reads. Pruning must be pure I/O — results identical to full-read+filter
    across inserts, cross-partition status transitions, and compaction."""

    def _seed(self, spark, warehouse):
        cat = Catalog(spark, warehouse)
        cat.write("t", mks(spark, [(1, "a", "pending"), (2, "b", "pending")]),
                  partition=("status", "pending"))
        return cat

    def test_pruned_read_skips_foreign_dirs(self, spark, warehouse):
        cat = self._seed(spark, warehouse)
        # a second tagged dir with a different value via upsert inserts
        cat.upsert("t", inserts=mks(spark, [(3, "c", "pending")]), keys=["k"],
                   inserts_value="pending")
        m = cat._read_manifest("t", cat.current_version("t"))
        assert all(isinstance(e, list) for e in m["data_dirs"])
        assert m["partition_col"] == "status"
        # selection helper: only matching dirs
        assert Catalog._select_dirs(m["data_dirs"], ["nope"]) == []
        assert len(Catalog._select_dirs(m["data_dirs"], ["pending"])) == 2
        assert rows3(cat.read("t", prune=("status", ["pending"]))) == [
            (1, "a", "pending"), (2, "b", "pending"), (3, "c", "pending")
        ]

    def test_status_transition_respects_pruning(self, spark, warehouse):
        """A base row moved out of 'pending' by a delta must vanish from the
        pruned pending read (anti-join side), and a row moved INTO an
        eligible status via delta must appear even though its base dir is
        pruned away (delta layers are always read)."""
        cat = self._seed(spark, warehouse)
        cat.upsert("t", updates=mks(spark, [(1, "a", "fetched")]), keys=["k"])
        got = rows3(cat.read("t", prune=("status", ["pending"])))
        assert got == [(2, "b", "pending")]
        # full read still sees everything
        assert rows3(cat.read("t")) == [(1, "a", "fetched"), (2, "b", "pending")]
        # transition back in via another delta
        cat.upsert("t", updates=mks(spark, [(1, "a2", "pending")]), keys=["k"])
        assert rows3(cat.read("t", prune=("status", ["pending"]))) == [
            (1, "a2", "pending"), (2, "b", "pending")
        ]

    def test_compaction_reestablishes_partition_layout(self, spark, warehouse):
        cat = self._seed(spark, warehouse)
        cat.compact_after = 2
        cat.upsert("t", updates=mks(spark, [(1, "a", "fetched")]), keys=["k"])
        cat.upsert("t", updates=mks(spark, [(2, "b", "denied")]), keys=["k"])
        cat.upsert("t", inserts=mks(spark, [(4, "d", "pending")]), keys=["k"],
                   inserts_value="pending")  # trips compaction (3 > 2? no: deltas=2)
        cat.upsert("t", updates=mks(spark, [(4, "d2", "pending")]), keys=["k"])
        m = cat._read_manifest("t", cat.current_version("t"))
        if m["delta_dirs"]:
            # force one more delta so compaction definitely triggered
            cat.upsert("t", updates=mks(spark, [(4, "d3", "pending")]), keys=["k"])
            m = cat._read_manifest("t", cat.current_version("t"))
        assert m["delta_dirs"] == []
        # post-compaction: every dir tagged, one per live status value
        vals = sorted(e[1] for e in m["data_dirs"])
        assert vals == ["denied", "fetched", "pending"]
        pend = rows3(cat.read("t", prune=("status", ["pending"])))
        assert all(s == "pending" for _, _, s in pend)
        assert rows3(cat.read("t")) == sorted(
            rows3(cat.read("t", prune=("status", ["pending", "fetched", "denied"])))
        )

    def test_untagged_table_ignores_prune_dirs_but_filters(self, spark, warehouse):
        cat = Catalog(spark, warehouse)
        cat.write("t", mks(spark, [(1, "a", "pending"), (2, "b", "done")]))
        got = rows3(cat.read("t", prune=("status", ["pending"])))
        assert got == [(1, "a", "pending")]

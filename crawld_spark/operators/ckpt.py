"""Lane-scoped localCheckpoint bookkeeping (r6).

Several query lanes materialize a shared subframe once per run with
``localCheckpoint(eager=False)`` (bucket rows, bigram rows, paragraph
chunks, the curation gate columns).  The checkpointed RDD blocks survive
the lane's action, so a long benchmark / correctness sweep accumulates
every lane's blocks in executor storage — measured as a broad slowdown of
later lanes in the full suite (GC + storage pressure), not of any lane in
isolation.

``ckpt_lazy`` registers what it checkpoints; ``flush_released`` (called on
entry to every query lane, before its plan is built) unpersists everything
a PREVIOUS lane registered.  Consumers of a lane's DataFrame therefore must
fully materialize it before building the next lane — which is exactly how
the bench, the driver correctness gate, and the tests consume them.
Engine-side code (plans/rounds.py) keeps its own explicit release_df
discipline and does not route through this registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PENDING: list[DataFrame] = []


def ckpt_lazy(df: DataFrame) -> DataFrame:
    """localCheckpoint(eager=False) + register the result for release when
    the next query lane is constructed."""
    out = df.localCheckpoint(eager=False)
    _PENDING.append(out)
    return out


def ckpt_register(df: DataFrame) -> DataFrame:
    """Register an already-checkpointed/cached frame for release when the
    next query lane is constructed."""
    _PENDING.append(df)
    return df


def flush_released() -> None:
    """Unpersist every checkpoint a previous lane registered (async)."""
    from crawld_spark.operators.seen import release_df

    global _PENDING
    pending, _PENDING = _PENDING, []
    for df in pending:
        release_df(df)

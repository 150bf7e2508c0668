"""Per-host fetch-budget allocation (largest-remainder apportionment).

Every crawl round must split one global fetch budget across hosts in
proportion to their priority mass — crawld does this implicitly through
its throttler + per-crawler limits (/root/reference/config/config.go:
throttler 1800/60/1000 and the limit modes); a frontier scheduler wants
it explicit so the politeness heap can be fed exactly ``alloc_h`` URLs
per host with no round-level overshoot.

Method: largest-remainder (Hamilton) apportionment, integer-exact —

  base_h = (B * mass_h) div T        (T = total mass)
  rem_h  = (B * mass_h) mod T
  L      = B - sum(base_h)           (0 <= L < n_hosts)

then the L hosts with the largest remainder (ties broken by host key
ascending) get one extra unit. Sum of allocations == B exactly, every
operation is int64 floor arithmetic, so the result is independent of
partitioning/ordering and the DuckDB twin replays it bit-for-bit.

Overflow contract: ``B * mass_h`` must fit int64 — callers scale mass
down (it is a priority *weight*, not a count) so that
``B * max(mass) < 2^63``; the engine's micro-unit priorities
(graph.SCALE = 1e6) leave room for budgets up to ~9e12.

Scale shape (10^8 hosts): inputs are HOST-cardinality aggregates, three
orders smaller than the URL table. T and L enter the plan as broadcast
scalar aggregates (never a driver round-trip); the only ordered step is
ranking hosts by remainder, which runs the two-phase range-partitioned
``plans.rank.global_rank`` — no single-partition window exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def allocate_budget(
    hosts: DataFrame,
    budget: int,
    host_col: str = "host",
    mass_col: str = "mass",
) -> DataFrame:
    """Apportion ``budget`` fetch slots over ``hosts`` proportionally to
    ``mass_col`` (nonnegative int64 weights). Returns
    ``(host, mass, base_q, rem_q, alloc)`` with ``sum(alloc) == budget``
    exactly (0 everywhere when total mass is 0).
    """
    from crawld_spark.plans.rank import global_rank

    h = hosts.select(
        F.col(host_col).alias("host"),
        F.col(mass_col).cast("long").alias("mass"),
    )
    tot = h.agg(F.coalesce(F.sum("mass"), F.lit(0)).alias("_T"))
    based = (
        h.crossJoin(F.broadcast(tot))
        .select(
            "host",
            "mass",
            F.expr(f"if(_T > 0, ({budget}L * mass) div _T, 0L)")
            .cast("long")
            .alias("base_q"),
            F.expr(f"if(_T > 0, ({budget}L * mass) % _T, 0L)")
            .cast("long")
            .alias("rem_q"),
        )
    )
    leftover = based.agg(
        (F.lit(budget) - F.coalesce(F.sum("base_q"), F.lit(0)))
        .cast("long")
        .alias("_L"),
        F.coalesce(F.sum("mass"), F.lit(0)).alias("_T2"),
    )
    ranked = global_rank(
        based, [F.desc("rem_q"), F.asc("host")], out="_rk"
    )
    return (
        ranked.crossJoin(F.broadcast(leftover))
        .select(
            "host",
            "mass",
            "base_q",
            "rem_q",
            F.expr(
                "base_q + if(_T2 > 0 AND _rk <= _L, 1L, 0L)"
            ).cast("long").alias("alloc"),
        )
    )

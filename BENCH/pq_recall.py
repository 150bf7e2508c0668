"""Measure the PQ/IVF-PQ recall dial table (VERDICT r4 item 5).

Recall@5 against exact brute-force cosine ground truth as the three
compression/search dials vary:

- ``m``            — subspaces per vector (bytes per code; compression)
- ``n_probe``      — IVF cells scanned per query (rows touched)
- ``rfactor``      — exact-rerank depth (k·rfactor candidates re-scored)

Run:  python BENCH/pq_recall.py            (defaults: sf0.1, local[32])
Env:  SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS

Writes BENCH/PQ_RECALL_r5.md (markdown table + raw JSON). The
monotonicity the table exhibits (recall non-decreasing in n_probe and
rfactor at fixed m; deeper rerank recovers what coarser codes lose) is
regression-guarded by tests/test_pq.py::TestRecallDialTable.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawld_spark.operators import pq, similarity  # noqa: E402
from crawld_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_QUERIES, K, TRAIN_SAMPLE = 20, 5, 256


def recall_at_k(rows, brute) -> float:
    got: dict = {}
    for r in rows:
        got.setdefault(r.qid, set()).add(r.nid)
    return sum(len(got.get(q, set()) & b) for q, b in brute.items()) / sum(
        len(b) for b in brute.values()
    )


def main() -> None:
    spark = get_spark(
        "pq_recall", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    queries = emb.where(f"vec_id < {N_QUERIES}")
    corpus = emb.where(f"vec_id >= {N_QUERIES}").select("vec_id", "embedding")
    n_corpus = corpus.count()

    brute: dict = {}
    for r in similarity.brute_force_topk(queries, corpus, k=K).collect():
        brute.setdefault(r.qid, set()).add(r.nid)

    results = []
    for m in (4, 8):
        books = pq.pq_train(
            corpus, m=m, ksub=16, n_iter=3, train_sample=TRAIN_SAMPLE
        )
        codes = pq.pq_encode(corpus, books)
        rec = recall_at_k(
            pq.pq_topk_adc(queries, codes, books, k=K).collect(), brute
        )
        results.append({"m": m, "n_probe": None, "rfactor": 1, "recall": rec})
        for rf in (3, 10):
            rec = recall_at_k(
                pq.pq_topk_rerank(
                    queries, corpus, books, k=K, rfactor=rf, codes=codes
                ).collect(),
                brute,
            )
            results.append({"m": m, "n_probe": None, "rfactor": rf, "recall": rec})
        for n_probe in (1, 2, 4):
            for rf in (3, 10):
                rec = recall_at_k(
                    pq.ivf_pq_topk(
                        queries, corpus, k=K, n_cells=8, n_probe=n_probe,
                        m=m, ksub=16, rfactor=rf, train_sample=TRAIN_SAMPLE,
                    ).collect(),
                    brute,
                )
                results.append(
                    {"m": m, "n_probe": n_probe, "rfactor": rf, "recall": rec}
                )
        print(f"m={m} done", flush=True)

    lines = [
        "# PQ / IVF-PQ recall dial table (r5)",
        "",
        f"recall@{K} vs exact brute-force cosine, {N_QUERIES} queries over a",
        f"{n_corpus}-vector corpus ({SF_DIR}), ksub=16, n_cells=8,",
        f"hash-ordered train sample {TRAIN_SAMPLE}. n_probe `-` = exhaustive",
        "(no IVF: pure ADC / flat rerank); rfactor 1 = no rerank.",
        "",
        "| m | n_probe | rfactor | recall@5 |",
        "|---|---------|---------|----------|",
    ]
    for r in results:
        npb = "-" if r["n_probe"] is None else r["n_probe"]
        lines.append(f"| {r['m']} | {npb} | {r['rfactor']} | {r['recall']:.4f} |")
    lines += [
        "",
        "Raw JSON:",
        "```json",
        json.dumps(results),
        "```",
        "",
        "Guarded by tests/test_pq.py::TestRecallDialTable (monotone in",
        "rfactor and n_probe at fixed m, at sf0.001 per-commit).",
    ]
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PQ_RECALL_r5.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()

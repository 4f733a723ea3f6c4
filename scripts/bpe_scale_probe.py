#!/usr/bin/env python3
"""BPE merge-count regime probe (r18, VERDICT r17 #4): measure
passes-vs-merges for the batched trainer at realistic merge counts
(>= 1k), plus the Arrow tokenizer tier at a merge depth the chained
replace path cannot express.

The fixture corpus's natural vocabulary is 31 words (~107 learnable
merges), so the probe derives a RICH deterministic vocabulary in pure
codegen: each document's text becomes the 8 eight-hex-char chunks of
its sha256 — ~|corpus| distinct words over a 16-symbol alphabet, the
adversarial LOW-tie-diversity regime for batching (near-uniform pair
counts mean the strictly-above prune keeps batches small; Zipf text
batches far wider, so these pass counts are an upper bound).

Writes scripts/bpe_scale_probe.json and prints a markdown table.
Usage: python scripts/bpe_scale_probe.py [n_merges ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.1"


def hex_word_docs(spark):
    """(doc_id, text): 8 eight-char hex words per document, derived
    from sha256(text) in codegen — vocabulary ∝ corpus size."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id",
            F.expr(
                "array_join(transform(sequence(0, 7), "
                "i -> substring(sha2(text, 256), i * 8 + 1, 8)), ' ')"
            ).alias("text"),
        )
    )


def main() -> None:
    from etl_pulumi_aws_snowflake_spark import get_spark
    from etl_pulumi_aws_snowflake_spark.operators import bpe as B

    merge_counts = [int(a) for a in sys.argv[1:]] or [100, 400, 1000]
    spark = get_spark(app_name="bpe_scale_probe", cpus=8,
                      shuffle_partitions=8)
    docs = hex_word_docs(spark)
    n_vocab = (
        docs.selectExpr("explode(split(text, ' ')) AS w")
        .distinct().count()
    )
    rows = []
    for n in merge_counts:
        stats: dict = {}
        t0 = time.time()
        merges = B.train_bpe(docs, n, stats=stats)
        train_s = time.time() - t0
        t0 = time.time()
        tok = B.bpe_token_counts(docs, merges)  # auto → arrow past 192
        total = tok.groupBy().sum("n_tokens").first()[0]
        tok_s = time.time() - t0
        rows.append(
            {
                "n_merges": len(merges),
                "passes": stats["passes"],
                "batch_factor": round(len(merges) / stats["passes"], 2),
                "train_sec": round(train_s, 2),
                "tokenize_sec": round(tok_s, 2),
                "tokenize_tier": (
                    "arrow" if len(merges) > B.MAX_REPLACE_MERGES
                    else "replace"
                ),
                "total_tokens": int(total),
            }
        )
        print(rows[-1], flush=True)
    report = {"sf_dir": SF, "distinct_hex_words": n_vocab, "rows": rows}
    out = REPO / "scripts" / "bpe_scale_probe.json"
    out.write_text(json.dumps(report, indent=1))
    print(f"vocab {n_vocab} distinct hex words")
    print("| merges | passes | merges/pass | train s | tokenize s (tier) |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['n_merges']} | {r['passes']} | {r['batch_factor']} "
            f"| {r['train_sec']} | {r['tokenize_sec']} "
            f"({r['tokenize_tier']}) |"
        )
    spark.stop()


if __name__ == "__main__":
    main()

"""BPE trainer probe at real-vocab scale (VERDICT r03 #1 / next-round #2).

The r03 registry exercises 32-48 merges; a production tokenizer vocab is
tens of thousands.  This probe trains >=8k merges over a 1M-doc corpus and
separates the two cost regimes:

- the ONE distributed pass (word_frequencies scan + cap/collect), and
- the driver-side merge loop, now incremental (pair->word index + lazy
  heap) — the r03 naive loop extrapolated to ~8 h at 30k merges; the
  incremental form must land in driver-minutes.

Also times distributed encoding with the learned large vocab (the ranks
dict rides the closure; per-token cost grows with merge count).

Run: ``python scripts/bpe_probe.py [n_docs] [num_merges]``.
Output: one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark import (  # noqa: E402
    get_spark,
)
from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_spark.operators import (  # noqa: E402
    bpe as B,
)


def zipf_docs(spark, n: int, vocab: int = 200_000, words_per_doc: int = 30):
    """~n docs over a ~``vocab``-word Zipfian vocabulary (P(rank) ~ 1/rank
    via inverse-CDF ``rank = vocab^u``), words spelled as base-26 letter
    strings so merges have shared prefixes to learn.  All native column
    expressions — the fixture documents table is unusable here (its
    synthetic text has only ~61 distinct words, VERDICT-grade surprise
    found while building this probe)."""

    def word(tok_j):
        u = (
            F.pmod(F.hash(F.col("id"), F.lit(tok_j)), F.lit(1_000_000))
            + F.lit(0.5)
        ) / F.lit(1_000_000.0)
        rank = F.floor(
            F.pow(F.lit(float(vocab)), u.cast("double"))
        ).cast("long")
        # base-26 spelling, 4 letters covers 456k ranks
        letters = [
            F.char(
                F.lit(97) + F.pmod((rank / F.lit(26**k)).cast("long"), F.lit(26))
            )
            for k in range(4)
        ]
        return F.concat(*letters)

    return spark.range(0, n, 1, 64).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[word(j) for j in range(words_per_doc)]).alias(
            "text"
        ),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    num_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 8_192
    spark = get_spark(app_name="bpe-probe")
    results: dict = {"n_docs": n_docs, "num_merges": num_merges}

    docs = zipf_docs(spark, n_docs).cache()
    results["actual_docs"] = docs.count()

    # distributed sufficient-statistics pass, timed separately
    t0 = time.time()
    wf = B.word_frequencies(docs)
    n_distinct = wf.count()
    results["distinct_words"] = n_distinct
    results["word_freq_scan_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    merges, dropped = B.train_bpe(
        docs, num_merges=num_merges, max_words=100_000
    )
    results["train_sec_total"] = round(time.time() - t0, 2)
    results["merges_learned"] = len(merges)
    results["dropped_words"] = dropped

    # distributed encode with the large learned vocab on a 100k-doc slice
    sample = docs.limit(100_000)
    t0 = time.time()
    total_tokens = (
        B.bpe_encode(sample, merges)
        .agg(F.sum("bpe_tokens"))
        .collect()[0][0]
    )
    dt = time.time() - t0
    results["encode_docs"] = 100_000
    results["encode_sec"] = round(dt, 2)
    results["encode_tokens"] = int(total_tokens)
    results["encode_tokens_per_sec"] = int(total_tokens / dt)

    print(json.dumps(results))


if __name__ == "__main__":
    main()

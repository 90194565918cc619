"""100x-documents scale experiment.

Synthesizes N_COPIES variants of every sf0.1 document (default 100x
-> ~500k docs, ~0.5 GB of text), with a controlled duplicate rate:
every 20th copy keeps the text verbatim (exact + near dup), the rest
mutate ~1/3 of words (distinct under 5-gram shingling). Then times
the shuffle-heavy operators and prints per-doc throughput next to
the sf0.1 baseline, so sub-linear/super-linear scaling is visible.

Usage: python scripts/scale_experiment.py [n_copies]
Writes scratch data under .scratch/ (gitignored); one JSON line out.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from prql_spark import Catalog, build_spark
from prql_spark.operators import dedup

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".scratch")


def synthesize(spark, n_copies: int) -> str:
    out = os.path.join(SCRATCH, f"docs_x{n_copies}")
    if os.path.exists(out):
        shutil.rmtree(out)
    docs = Catalog(spark, SF_DIR).load("documents")
    copies = spark.range(n_copies).withColumnRenamed("id", "copy")
    big = (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") * n_copies + F.col("copy")).alias("doc_id"),
            F.when(F.col("copy") % 20 == 0, F.col("text"))
            .otherwise(
                # mutate ~1/3 of words so 5-gram shingles differ
                F.expr(
                    "concat_ws(' ', transform(split(text, ' '), "
                    "(w, j) -> IF((j + copy) % 3 = 0, "
                    "concat(w, '_', copy % 7), w)))"
                )
            )
            .alias("text"),
            "source",
            "n_chars",
        )
        .repartition(64)
    )
    big.write.mode("overwrite").parquet(out)
    return out


def main():
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = build_spark("scale-exp")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    path = synthesize(spark, n_copies)
    gen_s = round(time.time() - t0, 1)
    big = spark.read.parquet(path)
    n = big.count()

    def run(name, fn):
        # warm (codegen constants), then steady-state
        fn().count()
        t = time.time()
        rows = fn().count()
        return {"sec": round(time.time() - t, 2), "rows": rows}

    res = {
        "n_docs": n,
        "gen_sec": gen_s,
        "dedup_exact": run(
            "dedup_exact", lambda: dedup.dedup_exact(big)
        ),
        "dedup_minhash_lsh": run(
            "minhash", lambda: dedup.dedup_minhash_lsh(big)
        ),
    }
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()

"""Property battery: random tombstone sets — live search must equal the
python-filtered tombstone-blind reference for every query shape, with
pruning active wherever the planner engages."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest

from siem_on_amazon_opensearch_service_spark.operators import deletes as dl
from siem_on_amazon_opensearch_service_spark.operators.search import search_df

QUERIES = [
    "error",
    "error AND refused",
    "timeout OR refused OR denied",
    '"connection reset"',
    "(error AND refused) OR denied",
]


class TestRandomTombstones:
    def test_random_sets_match_reference(self, spark, tiny_index, tmp_path):
        src, _ = tiny_index
        idx = str(tmp_path / "index")
        shutil.copytree(src, idx)
        deldir = os.path.join(idx, dl.DELETES_SUBDIR)
        all_ids = np.array(
            [r["docid"] for r in spark.read.parquet(os.path.join(src, "docs"))
             .select("docid").collect()],
            dtype=np.int64,
        )
        full = {
            q: [
                (int(r["docid"]), float(np.float32(r["score"])))
                for r in search_df(spark, src, q, k=None).collect()
            ]
            for q in QUERIES
        }
        rng = np.random.RandomState(7)
        for trial in range(6):
            n = int(rng.randint(1, max(2, all_ids.size // 3)))
            dels = set(rng.choice(all_ids, size=n, replace=False).tolist())
            shutil.rmtree(deldir, ignore_errors=True)
            os.makedirs(deldir)
            pd.DataFrame({"docid": sorted(dels)}).to_parquet(
                os.path.join(deldir, "part-0.parquet")
            )
            for q in QUERIES:
                exp = [
                    (d, round(s, 3))
                    for d, s in sorted(
                        [(d, s) for d, s in full[q] if d not in dels],
                        key=lambda t: (-t[1], t[0]),
                    )[:10]
                ]
                got = [
                    (int(r["docid"]), round(float(r["score"]), 3))
                    for r in dl.search_live_df(spark, idx, q, k=10).collect()
                ]
                assert got == exp, (trial, q, n)

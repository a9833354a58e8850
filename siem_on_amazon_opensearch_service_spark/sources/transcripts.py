"""Deterministic synthetic transcript corpus (BASELINE.json input_hint).

Schema: (conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp) — one row per conversation turn.  The corpus is
a pure function of the conversation index (seeded numpy per conversation,
fixed draw sequence), so generation is byte-identical at any Spark
parallelism and between the Spark and pandas paths — the property the
stable-docID invariant is tested against (SURVEY.md §5.2).

Corpus properties demanded by BASELINE.json / FIXTURES.md:
- Zipf-ish vocabulary with forced hot terms ('error', 'assistant', tool
  names) — the hot-term skew the salted term shuffle must survive;
- injected bigram "connection reset" for phrase-within-turn queries;
- a few > 32,766-byte texts (truncation rule) and empty / '-' texts
  (del_none analogue, /root/reference/source/lambda/es_loader/siem/
  __init__.py:1103-1145);
- ts monotone within a conversation, spread over ~30 days.

Everything stays ASCII so SQL oracles can treat bytes == chars.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

SEED = 42
TURNS_PER_SF = 2_000_000  # sf1.0 ~ 2M turns (FIXTURES.md "bench" scale)
AVG_TURNS_PER_CONV = 110.5  # mean of uniform[20, 201)

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["bash", "read", "write", "grep", "web"])

HOT_TERMS = [
    "the", "assistant", "error", "a", "to", "of", "and", "in", "is",
    "bash", "read", "request", "file", "timeout", "response", "user",
    "write", "grep", "web", "token", "failed", "retry", "connection",
    "reset", "refused", "exception", "network", "permission", "denied",
    "model", "system", "output", "input", "command", "result", "line",
]
N_TAIL_WORDS = 8000


def _vocab() -> tuple[np.ndarray, np.ndarray]:
    words = np.array(HOT_TERMS + [f"w{i:05d}" for i in range(N_TAIL_WORDS)])
    ranks = np.arange(1, len(words) + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.15  # zipf-ish, heavy head
    probs /= probs.sum()
    return words, probs


_WORDS, _PROBS = _vocab()
_BASE_TS = np.datetime64("2025-06-01T00:00:00")


def n_convs_for_sf(sf: float) -> int:
    return max(1, int(round(sf * TURNS_PER_SF / AVG_TURNS_PER_CONV)))


def conv_batch(convs: np.ndarray) -> pd.DataFrame:
    """Generate all turns for the given conversation indices (vectorized
    per conversation; fixed RNG draw sequence => parallelism-independent)."""
    frames: list[dict] = []
    for c in np.asarray(convs, dtype=np.int64):
        rng = np.random.RandomState((SEED * 1_000_003 + int(c)) % (2**31 - 1))
        n = int(rng.randint(20, 201))
        gaps = rng.randint(1, 301, size=n)
        role_r = rng.rand(n)
        nwords = rng.randint(5, 61, size=n)
        word_idx = rng.choice(len(_WORDS), size=(n, 60), p=_PROBS)
        phrase_r = rng.rand(n)
        empty_r = rng.rand(n)
        tool_idx = rng.randint(0, len(TOOLS), size=n)
        phrase_pos = rng.randint(0, 5, size=n)
        big_turn = int(rng.randint(0, 7000))  # one giant text per ~35 convs
        big_words = rng.choice(len(_WORDS), size=6000, p=_PROBS)

        ts = _BASE_TS + np.timedelta64(1, "h") * (int(c) % 720) + np.cumsum(gaps).astype("timedelta64[s]")
        roles = np.where(role_r < 0.15, "tool", np.where(role_r < 0.55, "assistant", "user"))
        roles[0] = "system"
        tools = np.where(roles == "tool", TOOLS[tool_idx], None)

        texts: list[str | None] = []
        for j in range(n):
            if empty_r[j] < 0.010:
                texts.append("")
                continue
            if empty_r[j] < 0.015:
                texts.append("-")
                continue
            if j == big_turn and n > 30:
                texts.append(" ".join(_WORDS[big_words]))  # ~40 KB > 32,766
                continue
            ws = list(_WORDS[word_idx[j, : nwords[j]]])
            if phrase_r[j] < 0.08:
                p = min(int(phrase_pos[j]), len(ws))
                ws[p:p] = ["connection", "reset"]
            texts.append(" ".join(ws))

        frames.append(
            {
                "conv_id": np.repeat(f"conv-{int(c):08d}", n),
                "turn_idx": np.arange(n, dtype=np.int32),
                "role": roles,
                "text": np.array(texts, dtype=object),
                "tool": tools,
                "ts": ts,
            }
        )
    if not frames:
        return pd.DataFrame(
            {"conv_id": pd.Series(dtype=str), "turn_idx": pd.Series(dtype="int32"),
             "role": pd.Series(dtype=str), "text": pd.Series(dtype=str),
             "tool": pd.Series(dtype=str), "ts": pd.Series(dtype="datetime64[us]")}
        )
    out = pd.concat([pd.DataFrame(f) for f in frames], ignore_index=True)
    out["ts"] = out["ts"].astype("datetime64[us]")
    return out


def generate_pandas(sf: float) -> pd.DataFrame:
    return conv_batch(np.arange(n_convs_for_sf(sf)))


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def generate_spark(spark, sf: float, parallelism: int | None = None):
    """Distributed generation: one task per conversation batch.

    Same bytes as generate_pandas for any parallelism (tested)."""
    n = n_convs_for_sf(sf)
    parallelism = parallelism or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            yield conv_batch(pdf["conv"].to_numpy())

    return (
        spark.range(0, n, 1, numPartitions=min(parallelism * 4, max(1, n)))
        .selectExpr("id as conv")
        .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    )


def ensure_parquet(path: str, sf: float, spark=None) -> str:
    """Write the corpus parquet once (atomic rename); reuse afterwards."""
    if os.path.exists(path):
        return path
    tmp = path + ".tmp"
    if spark is not None and sf >= 0.05:
        generate_spark(spark, sf).write.mode("overwrite").parquet(tmp)
    else:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        import pyarrow as pa
        import pyarrow.parquet as pq

        pdf = generate_pandas(sf)
        table = pa.Table.from_pandas(pdf, preserve_index=False)
        pq.write_table(table, tmp)
    os.rename(tmp, path)
    return path

"""Property-based tests (hypothesis) for the frozen numeric core."""

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from siem_on_amazon_opensearch_service_spark.functions import varint
from siem_on_amazon_opensearch_service_spark.functions.analysis import (
    SQL_SPLIT_RE,
    tokenize,
)
from siem_on_amazon_opensearch_service_spark.functions.smallfloat import (
    byte4_to_int,
    int_to_byte4,
)
from siem_on_amazon_opensearch_service_spark.operators import segments


@given(st.lists(st.integers(min_value=0, max_value=2**52), max_size=300))
@settings(max_examples=60, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.asarray(vals, dtype=np.uint64)
    out = varint.decode(varint.encode(arr))
    assert list(out) == vals


@given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=200))
@settings(max_examples=60, deadline=None)
def test_delta_roundtrip_sorted(vals):
    arr = np.asarray(sorted(vals), dtype=np.uint64)
    out = varint.delta_decode(varint.delta_encode(arr))
    assert list(out) == sorted(vals)


@given(st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=200, deadline=None)
def test_smallfloat_properties(x):
    b = int_to_byte4(x)
    d = byte4_to_int(b)
    assert 0 <= b <= 255
    assert d <= x  # decode floors
    assert int_to_byte4(d) == b  # idempotent
    if x > 0:
        assert byte4_to_int(int_to_byte4(x - 1)) <= d  # monotone


_ascii_text = st.text(
    alphabet=st.sampled_from(list("abcXYZ019_ .,-!\t\n'\"/\\()[]")), max_size=400
)


@given(_ascii_text)
@settings(max_examples=100, deadline=None)
def test_tokenizer_matches_sql_split(text):
    """The frozen Python analyzer and the DuckDB SQL formulation used by
    every oracle must agree token-for-token on ASCII input."""
    sql_toks = duckdb.sql(
        "SELECT list_filter(string_split_regex(lower($1), '" + SQL_SPLIT_RE + "'), x -> x <> '')",
        params=[text],
    ).fetchone()[0]
    assert tokenize(text) == list(sql_toks)


@given(_ascii_text)
@settings(max_examples=60, deadline=None)
def test_tokenize_series_matches_scalar(text):
    got = segments.tokenize_series(pd.Series([text, text + " tail"]))
    assert list(got.iloc[0]) == tokenize(text)
    assert list(got.iloc[1]) == tokenize(text + " tail")
    assert int(segments.token_counts(pd.Series([text]))[0]) == len(tokenize(text))


def test_tokenize_series_nonascii_matches_scalar():
    """Non-ASCII chars whose lower() maps INTO ascii ('İ' -> 'i'+combining,
    'K' Kelvin -> 'k') must not mint tokens the frozen findall-then-lower
    tokenizer never emits (ADVICE r1: engine/oracle desync on real text)."""
    tricky = [
        "İstanbul error",          # U+0130: lower() -> 'i' + U+0307
        "temp 300K today",    # U+212A Kelvin sign: lower() -> 'k'
        "straße connection",       # ß stays non-ascii
        "日本語 timeout mixed",      # CJK
        "café ACCENT é",           # accented latin
        "plain ascii Control",
    ]
    got = segments.tokenize_series(pd.Series(tricky))
    for s, toks in zip(tricky, got):
        assert list(toks) == tokenize(s), s
    counts = segments.token_counts(pd.Series(tricky))
    for s, n in zip(tricky, counts):
        assert int(n) == len(tokenize(s)), s


@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=5000),  # docid
        st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=8, unique=True),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=40, deadline=None)
def test_segment_encode_decode_roundtrip(doc_positions):
    """Posting rows survive encode -> decode for arbitrary (docid, positions)
    sets routed through the same path the builder uses."""
    docids = np.asarray(sorted(doc_positions), dtype=np.int64)
    token_lists = pd.Series(
        [["t"] * len(doc_positions[d]) for d in sorted(doc_positions)]
    )
    # craft per-doc token lists whose positions are 0..tf-1 (explode_entries
    # assigns positions by order); tf roundtrip is the invariant here
    norms = np.zeros(docids.size, dtype=np.uint8)
    out = segments.encode_shard_postings(0, docids, norms, token_lists, True, 4)
    assert len(out) == 1
    row = out.iloc[0]
    dec_docs, dec_tfs = segments.decode_docs_tfs(row)
    assert list(dec_docs) == list(docids)
    assert list(dec_tfs) == [len(doc_positions[d]) for d in sorted(doc_positions)]
    pos, off = segments.decode_positions(row, dec_tfs)
    for i in range(len(dec_docs)):
        assert list(pos[off[i] : off[i + 1]]) == list(range(int(dec_tfs[i])))


@given(
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_bmp_roundtrip_property(h, w, seed):
    """encode_bmp/decode_bmp are exact inverses for any (H, W) uint8 RGB
    image, including the widths that force 4-byte row padding."""
    from siem_on_amazon_opensearch_service_spark.operators import multimodal as mm

    arr = np.random.RandomState(seed).randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (mm.decode_bmp(mm.encode_bmp(arr)) == arr).all()


@given(
    n=st.integers(min_value=1, max_value=500),
    ch=st.integers(min_value=1, max_value=3),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(n, ch, rate, seed):
    """encode_wav/decode_wav round-trip within 16-bit quantization for any
    sample count / channel count / rate."""
    from siem_on_amazon_opensearch_service_spark.operators import multimodal as mm

    a = (np.random.RandomState(seed).rand(n, ch).astype(np.float32) * 2 - 1) * 0.999
    out, r = mm.decode_wav(mm.encode_wav(a, rate))
    assert r == rate and out.shape == a.shape
    # encode scales by 32767, decode by 1/32768: error <= |a|/32768 +
    # 0.5/32768 rounding <= 1.5/32768
    assert np.abs(out - a).max() <= 1.6 / 32768


@given(
    terms=st.lists(st.text(alphabet="abcdefghij0123456789_", min_size=1, max_size=12),
                   min_size=1, max_size=30),
    nb=st.sampled_from([16, 64, 4096]),
)
@settings(max_examples=60, deadline=None)
def test_postings_bucket_driver_jvm_agreement_shape(terms, nb):
    """The driver-side bucket function is stable, in-range, and
    deterministic (the JVM-side agreement with F.crc32 is covered by the
    Spark round-trip tests; this pins the pure-Python contract)."""
    from siem_on_amazon_opensearch_service_spark.operators.build import postings_bucket_py

    for t in terms:
        b = postings_bucket_py(t, nb)
        assert 0 <= b < nb
        assert b == postings_bucket_py(t, nb)

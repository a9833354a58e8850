"""Snapshot / verify / restore ops APIs (operators/build.py): restored
index answers queries identically to the snapshot-time index, including
after the live index diverges via an append; corruption and overwrite
cases fail loudly."""

import json
import os
import shutil

import numpy as np
import pytest

from siem_on_amazon_opensearch_service_spark.operators.build import (
    build_index,
    restore_snapshot,
    snapshot,
    verify_snapshot,
)
from siem_on_amazon_opensearch_service_spark.operators.search import LocalIndex


@pytest.fixture(scope="module")
def snap_env(spark, tiny_corpus_pdf, tmp_path_factory):
    root = tmp_path_factory.mktemp("snap")
    idx = str(root / "index")
    pdf = tiny_corpus_pdf
    convs = sorted(pdf["conv_id"].unique())
    first = pdf[pdf["conv_id"].isin(convs[: len(convs) // 2])]
    build_index(spark, spark.createDataFrame(first), idx, n_shards=4, n_salts=2)
    return root, idx, pdf, convs


class TestSnapshotRestore:
    def test_roundtrip_and_divergence(self, spark, snap_env):
        root, idx, pdf, convs = snap_env
        snap, dest = str(root / "snap"), str(root / "restored")
        pre = LocalIndex(idx).search("error AND timeout", k=10)
        info = snapshot(idx, snap)
        assert info["n_files"] > 0
        assert verify_snapshot(snap)["n_files"] == info["n_files"]

        # diverge the live index: append the held-back half
        from siem_on_amazon_opensearch_service_spark.streaming.incremental import (
            append_batch,
        )

        later = pdf[pdf["conv_id"].isin(convs[len(convs) // 2 :])]
        append_batch(spark, spark.createDataFrame(later), idx, batch_id=1)
        post = LocalIndex(idx).search("error AND timeout", k=10)
        assert post != pre  # the append changed results (more docs)

        restore_snapshot(snap, dest)
        got = LocalIndex(dest).search("error AND timeout", k=10)
        assert [(int(d), np.float32(s)) for d, s in got] == [
            (int(d), np.float32(s)) for d, s in pre
        ]

    def test_corruption_detected(self, snap_env):
        root, idx, _, _c = snap_env
        snap = str(root / "snap_bad")
        snapshot(idx, snap)
        # flip one byte of one manifested file
        with open(os.path.join(snap, "_snapshot.json")) as f:
            rel = sorted(json.load(f)["files"])[0]
        p = os.path.join(snap, rel)
        data = bytearray(open(p, "rb").read())
        data[0] ^= 0xFF
        open(p, "wb").write(bytes(data))
        with pytest.raises(ValueError, match="checksum|size"):
            verify_snapshot(snap)
        with pytest.raises(ValueError):
            restore_snapshot(snap, str(root / "never"))
        assert not os.path.exists(str(root / "never"))

    def test_missing_file_detected(self, snap_env):
        root, idx, _, _c = snap_env
        snap = str(root / "snap_missing")
        snapshot(idx, snap)
        with open(os.path.join(snap, "_snapshot.json")) as f:
            rel = sorted(json.load(f)["files"])[-1]
        os.remove(os.path.join(snap, rel))
        with pytest.raises(ValueError, match="file set mismatch"):
            verify_snapshot(snap)

    def test_no_overwrite(self, snap_env):
        root, idx, _, _c = snap_env
        snap = str(root / "snap_ow")
        snapshot(idx, snap)
        with pytest.raises(ValueError, match="already exists"):
            snapshot(idx, snap)
        dest = str(root / "dest_ow")
        os.makedirs(dest)
        with pytest.raises(ValueError, match="already exists"):
            restore_snapshot(snap, dest)
        shutil.rmtree(dest)

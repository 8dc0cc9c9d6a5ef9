"""WebDataset export (plans/webdataset.py): round-trip, pair
adjacency, deterministic bytes across partitionings, manifest
integrity, shard sizing."""

import hashlib
import io
import tarfile

import numpy as np
import pytest

from paddleocr_spark.kernels.png import encode_gray_png
from paddleocr_spark.plans.webdataset import export_webdataset


def _pairs_df(spark, n=40):
    rows = []
    for i in range(n):
        img = encode_gray_png(
            np.full((4, 4), i % 251, dtype=np.uint8)
        )
        rows.append((f"doc{i:05d}", bytearray(img), f"caption {i}"))
    return spark.createDataFrame(rows, "key string, image binary, text string")


def test_roundtrip_and_pair_adjacency(spark, tmp_path):
    out = str(tmp_path / "wds")
    manifest = export_webdataset(
        spark, _pairs_df(spark), out, pairs_per_shard=16
    ).collect()
    assert sum(r["n_pairs"] for r in manifest) == 40
    assert len(manifest) == 3  # ceil(40/16)
    seen = {}
    for r in manifest:
        path = f"{out}/shard-{r['shard_id']:06d}.tar"
        blob = open(path, "rb").read()
        assert len(blob) == r["n_bytes"]
        assert hashlib.sha256(blob).hexdigest() == r["sha256"]
        with tarfile.open(fileobj=io.BytesIO(blob)) as tar:
            names = tar.getnames()
            # members arrive in (key.png, key.txt) adjacent pairs
            assert len(names) == 2 * r["n_pairs"]
            for j in range(0, len(names), 2):
                k_png, k_txt = names[j], names[j + 1]
                assert k_png.endswith(".png") and k_txt.endswith(".txt")
                assert k_png[:-4] == k_txt[:-4]
                txt = tar.extractfile(k_txt).read().decode()
                i = int(k_txt[3:8])
                assert txt == f"caption {i}"
                png = tar.extractfile(k_png).read()
                seen[k_png[:-4]] = png
    assert len(seen) == 40


def test_bytes_deterministic_across_partitionings(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    df = _pairs_df(spark, 30)
    m1 = {
        r["shard_id"]: r["sha256"]
        for r in export_webdataset(
            spark, df.repartition(1), a, pairs_per_shard=8
        ).collect()
    }
    m2 = {
        r["shard_id"]: r["sha256"]
        for r in export_webdataset(
            spark, df.repartition(7), b, pairs_per_shard=8
        ).collect()
    }
    assert m1 == m2


def test_order_is_hash_shuffled_not_insertion(spark, tmp_path):
    out = str(tmp_path / "wds")
    export_webdataset(
        spark, _pairs_df(spark, 20), out, pairs_per_shard=20
    ).collect()
    with tarfile.open(f"{out}/shard-000000.tar") as tar:
        keys = [n[:-4] for n in tar.getnames() if n.endswith(".txt")]
    assert sorted(keys) == [f"doc{i:05d}" for i in range(20)]
    assert keys != sorted(keys)  # training order, not key order

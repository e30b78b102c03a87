"""Decode-once raw cache (data/cache.py) + device-side Normalize: the
cached uint8 eval pipeline must produce numerically identical batches to
the host-normalized real-decode pipeline."""

import tempfile

import numpy as np

from dev.bench_data_real import make_dataset_tree
from ir_ads_tpu.data.augmentations import (
    device_normalize,
    get_val_augmentation,
    get_val_augmentation_device_norm,
)
from ir_ads_tpu.data.cache import RawCache
from ir_ads_tpu.data.datasets import get_dataset


def _tree(n=4):
    root = tempfile.mkdtemp()
    make_dataset_tree(root, n)
    return root


def test_cache_round_trip_matches_dataset():
    root = _tree()
    ds = get_dataset("NYU")(root, "train", None, ["img", "depth"])
    cached = RawCache.build(ds, root + "/_c")
    assert len(cached) == len(ds)
    for i in range(len(ds)):
        s_ref, m_ref = ds[i]
        s_c, m_c = cached[i]
        np.testing.assert_array_equal(m_ref, m_c)
        for k in s_ref:
            np.testing.assert_array_equal(s_ref[k], s_c[k])
    # reopen from disk (second process semantics)
    again = RawCache.open(root + "/_c")
    s_a, m_a = again[1]
    s_ref, m_ref = ds[1]
    np.testing.assert_array_equal(m_a, m_ref)


def test_device_normalize_matches_host_normalize():
    root = _tree(2)
    ds_cls = get_dataset("NYU")
    host = ds_cls(
        root, "train", get_val_augmentation((480, 640)), ["img", "depth"]
    )
    raw = ds_cls(root, "train", None, ["img", "depth"])
    cached = RawCache.build(
        raw, root + "/_c2",
        transform=get_val_augmentation_device_norm((480, 640)),
    )
    s_h, _ = host[0]
    s_d, _ = cached[0]
    assert s_d["img"].dtype == np.uint8  # stays uint8 until the device
    got_img = np.asarray(device_normalize(s_d["img"], "img"))
    got_dep = np.asarray(device_normalize(s_d["depth"], "depth"))
    np.testing.assert_allclose(got_img, s_h["img"], atol=1e-5)
    np.testing.assert_allclose(got_dep, s_h["depth"], atol=1e-5)

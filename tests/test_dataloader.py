"""Native prefetching data loader vs the numpy fallback (data/loader.py).

The contract: both backends produce the SAME deterministic batch stream
(per-epoch mt19937_64 shuffle, per-sample splitmix64 flips, in-order
delivery), so training runs reproduce regardless of thread count or
whether the .so is built.
"""

import os

import numpy as np
import pytest

from interactive_vit_tpu.data.loader import Loader, save_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    images = rng.random((37, 3, 8, 8)).astype(np.float32)
    labels = rng.integers(0, 10, 37).astype(np.int64)
    prefix = str(d / "ds")
    save_dataset(prefix, images, labels)
    return prefix, images, labels


def test_native_matches_python_stream(dataset):
    prefix, _images, _labels = dataset
    nat = Loader(prefix + "_images.npy", prefix + "_labels.npy", batch=8,
                 seed=5, flip=True, backend="auto")
    py = Loader(prefix + "_images.npy", prefix + "_labels.npy", batch=8,
                seed=5, flip=True, backend="python")
    if not nat.native:
        pytest.skip("native loader not built")
    try:
        for i in range(12):  # 4 batches/epoch -> crosses two boundaries
            ai, al, ae = next(nat)
            bi, bl, be = next(py)
            assert ae == be
            np.testing.assert_array_equal(al, bl)
            np.testing.assert_array_equal(ai, bi)
    finally:
        nat.close()


def test_thread_count_does_not_change_stream(dataset):
    prefix, _images, _labels = dataset
    streams = []
    for threads in (1, 3):
        ld = Loader(prefix + "_images.npy", prefix + "_labels.npy",
                    batch=4, seed=9, flip=True, threads=threads, depth=6,
                    backend="auto")
        if not ld.native:
            pytest.skip("native loader not built")
        got = [next(ld) for _ in range(10)]
        ld.close()
        streams.append(got)
    for (ai, al, ae), (bi, bl, be) in zip(*streams):
        assert ae == be
        np.testing.assert_array_equal(al, bl)
        np.testing.assert_array_equal(ai, bi)


def test_epoch_covers_every_sample_once(dataset):
    prefix, _images, labels = dataset
    ld = Loader(prefix + "_images.npy", prefix + "_labels.npy", batch=8,
                seed=1, backend="python")
    seen = []
    for _ in range(ld.batches_per_epoch):
        _i, lab, ep = next(ld)
        assert ep == 0
        seen.extend(lab.tolist())
    # drop-last: 4 * 8 = 32 of 37 samples, all distinct positions
    assert len(seen) == 32
    # the shuffle is a permutation: batch labels are a sub-multiset of
    # the dataset's
    from collections import Counter

    assert not Counter(seen) - Counter(labels.tolist())


def test_flip_is_exact_mirror(dataset):
    prefix, images, _labels = dataset
    flip = Loader(prefix + "_images.npy", prefix + "_labels.npy", batch=8,
                  seed=3, flip=True, backend="python")
    plain = Loader(prefix + "_images.npy", prefix + "_labels.npy", batch=8,
                   seed=3, flip=False, backend="python")
    fi, _, _ = next(flip)
    pi, _, _ = next(plain)
    for k in range(8):
        same = np.array_equal(fi[k], pi[k])
        mirrored = np.array_equal(fi[k], pi[k][:, :, ::-1])
        assert same or mirrored
    # with seed 3 and 8 samples, at least one of each (sanity that the
    # flip coin isn't constant)
    outcomes = {np.array_equal(fi[k], pi[k]) for k in range(8)}
    assert outcomes == {True, False}


def test_malformed_inputs_raise(dataset, tmp_path):
    prefix, _images, _labels = dataset
    ip = prefix + "_images.npy"
    lp = prefix + "_labels.npy"
    with pytest.raises(ValueError, match="float32"):
        bad = tmp_path / "bad_images.npy"
        np.save(bad, np.zeros((4, 3, 8, 8), np.float64))
        Loader(str(bad), lp, batch=2)
    with pytest.raises(ValueError, match="int64"):
        bad = tmp_path / "bad_labels.npy"
        np.save(bad, np.zeros((37,), np.int32))
        Loader(ip, str(bad), batch=2)
    with pytest.raises(ValueError, match="batch"):
        Loader(ip, lp, batch=1000)


def test_train_cli_with_data_loader(dataset, tmp_path):
    """tools/train --data drives the loader end-to-end on a tiny model."""
    from interactive_vit_tpu.models import vit
    from interactive_vit_tpu.tools import train as train_tool

    prefix, _images, _labels = dataset
    cfg = vit.ViTConfig("vit_dl", img_size=8, patch=4, width=32, depth=1,
                        heads=2, num_classes=10)
    vit.VARIANTS["vit_dl"] = cfg
    try:
        train_tool.main([
            "--variant", "vit_dl", "--steps", "6", "--batch", "8",
            "--data", prefix, "--log-every", "10",
        ])
    finally:
        del vit.VARIANTS["vit_dl"]


def test_tiny_dataset_single_batch_epochs(dataset, tmp_path):
    """batches_per_epoch == 1 (batch <= n < 2*batch): the in-flight
    window spans many epochs — previously a perm-cache data race that
    produced divergent streams (review r3, reproduced at 24/200
    batches); the depth clamp must keep native == python here."""
    rng = np.random.default_rng(7)
    images = rng.random((63, 3, 4, 4)).astype(np.float32)
    labels = rng.integers(0, 5, 63).astype(np.int64)
    prefix = str(tmp_path / "tiny")
    save_dataset(prefix, images, labels)
    nat = Loader(prefix + "_images.npy", prefix + "_labels.npy", batch=32,
                 seed=11, flip=True, threads=4, depth=8, backend="auto")
    if not nat.native:
        pytest.skip("native loader not built")
    py = Loader(prefix + "_images.npy", prefix + "_labels.npy", batch=32,
                seed=11, flip=True, backend="python")
    try:
        for i in range(200):
            ai, al, ae = next(nat)
            bi, bl, be = next(py)
            assert ae == be == i
            np.testing.assert_array_equal(al, bl, err_msg=f"batch {i}")
            np.testing.assert_array_equal(ai, bi, err_msg=f"batch {i}")
    finally:
        nat.close()


def test_unknown_backend_raises(dataset):
    prefix, _i, _l = dataset
    with pytest.raises(ValueError, match="unknown backend"):
        Loader(prefix + "_images.npy", prefix + "_labels.npy", batch=4,
               backend="natvie")


def test_borrow_mode_stream_matches_and_invalidates(dataset):
    """borrow=True lends slot views (zero-copy): values match the python
    stream, and the previous batch's buffer is recycled after next()."""
    prefix, _i, _l = dataset
    nat = Loader(prefix + "_images.npy", prefix + "_labels.npy", batch=8,
                 seed=5, flip=True, borrow=True, backend="auto")
    if not nat.native:
        pytest.skip("native loader not built")
    py = Loader(prefix + "_images.npy", prefix + "_labels.npy", batch=8,
                seed=5, flip=True, backend="python")
    try:
        prev = None
        for i in range(8):
            ai, al, ae = next(nat)
            bi, bl, be = next(py)
            assert ae == be
            np.testing.assert_array_equal(np.array(ai), bi)
            np.testing.assert_array_equal(np.array(al), bl)
            prev = (ai, np.array(ai))
        # the borrowed view from the LAST batch goes stale after another
        # next() cycles the ring past its slot (depth=4 slots)
        stale_view, snapshot = prev
        for _ in range(4):
            next(nat)
        assert not np.array_equal(np.asarray(stale_view), snapshot)
    finally:
        nat.close()


def test_stray_release_does_not_drop_a_batch(dataset):
    """ivt_loader_release without an outstanding borrow must be a no-op:
    the old 'slot looks ready' guard let a stray/double release silently
    consume an unborrowed batch — an untraceable determinism break."""
    prefix, _i, _l = dataset
    nat = Loader(prefix + "_images.npy", prefix + "_labels.npy", batch=8,
                 seed=9, borrow=True, backend="auto")
    if not nat.native:
        pytest.skip("native loader not built")
    py = Loader(prefix + "_images.npy", prefix + "_labels.npy", batch=8,
                seed=9, backend="python")
    try:
        ai, al, _ = next(nat)
        snapshot = np.array(ai)
        # stray releases while a borrow is outstanding (the wrapper
        # released once internally per next(); these are EXTRA)
        nat._lib.ivt_loader_release(nat._handle)  # releases the borrow
        nat._lib.ivt_loader_release(nat._handle)  # stray: must no-op
        nat._lib.ivt_loader_release(nat._handle)  # stray: must no-op
        nat._borrowed = False  # wrapper bookkeeping matches reality
        bi0, _, _ = next(py)
        np.testing.assert_array_equal(snapshot, bi0)
        # the NEXT native batch is python batch 1, not 2/3: the stray
        # releases dropped nothing
        ai1, _, _ = next(nat)
        bi1, _, _ = next(py)
        np.testing.assert_array_equal(np.array(ai1), bi1)
    finally:
        nat.close()

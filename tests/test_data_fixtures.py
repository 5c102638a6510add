"""Hermetic real-format fixture tests (VERDICT r4 item 7).

This environment has no network egress, so the real CIFAR-10 / BLOCK files
never exist on disk — which left the real-format parser paths in
vqvae_tpu/data/datasets.py implemented but unexercised. These tests fabricate
byte-faithful fixtures in tmp_path and feed them through the REAL loaders:

- CIFAR-10: the standard python-pickle batch format (dict with b"data" rows of
  3072 uint8 in R-plane/G-plane/B-plane order, b"labels" list) exactly as
  torchvision 0.2.1 reads it (reference utils.py:11-25).
- BLOCK: a pickled OBJECT array of trajectories where element x yields the
  frame at x[0][0] with >=3 channels (reference datasets/block.py:14-21) —
  ragged frame sizes force dtype=object, exercising the allow_pickle path the
  dense-array test cannot.
"""

import pickle

import numpy as np


def _write_cifar_batches(root, rng, n_per_batch=4):
    """Fabricate <root>/cifar-10-batches-py/{data_batch_1..5,test_batch} in the
    on-disk CIFAR-10 python format; returns the images/labels written."""
    d = root / "cifar-10-batches-py"
    d.mkdir()
    all_imgs, all_labels = {}, {}
    for name in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        imgs = rng.integers(0, 256, (n_per_batch, 32, 32, 3), dtype=np.uint8)
        labels = rng.integers(0, 10, (n_per_batch,)).tolist()
        # HWC -> the format's per-row plane order: 1024 R, 1024 G, 1024 B
        rows = imgs.transpose(0, 3, 1, 2).reshape(n_per_batch, 3072)
        payload = {
            b"batch_label": f"batch of {n_per_batch}".encode(),
            b"labels": labels,
            b"data": rows,
            b"filenames": [f"img_{i}.png".encode() for i in range(n_per_batch)],
        }
        with open(d / name, "wb") as f:
            pickle.dump(payload, f)
        all_imgs[name], all_labels[name] = imgs, labels
    return all_imgs, all_labels


def test_cifar_pickle_loader_real_format(tmp_path):
    rng = np.random.default_rng(0)
    imgs, labels = _write_cifar_batches(tmp_path, rng)

    from vqvae_tpu.data.datasets import load_cifar10

    train, val, x_train_var, info = load_cifar10(str(tmp_path))
    assert info["synthetic"] is False
    assert len(train) == 5 * 4 and len(val) == 4

    # byte-exact layout: plane-ordered rows decode back to the HWC pixels,
    # batches concatenated in order, normalized (v/255)*2-1
    expect_u8 = np.concatenate([imgs[f"data_batch_{i}"] for i in range(1, 6)])
    np.testing.assert_allclose(
        train.data,
        (expect_u8.astype(np.float32) / 255.0) * 2.0 - 1.0,
        rtol=0, atol=1e-6,
    )
    np.testing.assert_array_equal(
        train.labels,
        np.concatenate([labels[f"data_batch_{i}"] for i in range(1, 6)]),
    )
    np.testing.assert_array_equal(val.labels, labels["test_batch"])

    # x_train_var is the reference's np.var(train_u8 / 255.0) on
    # PRE-normalization values (reference utils.py:79)
    assert abs(x_train_var - np.var(expect_u8.astype(np.float64) / 255.0)) < 1e-9


def test_block_pickled_object_array(tmp_path):
    """Ragged trajectories => np.save writes a pickled object array, the
    format np.load(allow_pickle=True) must parse (reference
    datasets/block.py:14-17 + channel slice x[0][0][:, :, :3])."""
    rng = np.random.default_rng(1)
    trials = np.empty(20, dtype=object)
    for i in range(20):
        side = 40 + (i % 3) * 8  # ragged frame sizes force dtype=object
        frame = rng.integers(0, 256, (side, side, 4), dtype=np.uint8)
        # element x with the frame at x[0][0] plus trailing junk the parser
        # must ignore, mirroring the trajectory tuples of the real file
        trials[i] = [[frame, {"step": i}], i]
    path = tmp_path / "randact_traj_length_100_n_trials_1000_n_contexts_1.npy"
    np.save(path, trials, allow_pickle=True)

    from vqvae_tpu.data.datasets import load_block

    train, val, x_train_var, info = load_block(str(tmp_path))
    assert len(train) == 18 and len(val) == 2  # 90/10 split
    assert train.data.shape == (18, 32, 32, 3)  # 4th channel dropped
    assert train.data.dtype == np.float32
    assert train.data.min() >= -1.0 and train.data.max() <= 1.0
    assert (train.labels == 0).all() and (val.labels == 0).all()  # label==0
    assert 0.0 < x_train_var < 1.0


def test_block_fourth_channel_is_dropped(tmp_path):
    """The alpha/extra channel must not leak into the resized RGB frames."""
    trials = np.empty(10, dtype=object)
    rgb = np.full((48, 48, 3), 128, np.uint8)
    for i in range(10):
        frame = np.concatenate(
            [rgb, np.full((48, 48, 1), 255 if i % 2 else 0, np.uint8)], axis=-1
        )
        trials[i] = [[frame]]
    path = tmp_path / "randact_traj_length_100_n_trials_1000_n_contexts_1.npy"
    np.save(path, trials, allow_pickle=True)

    from vqvae_tpu.data.datasets import load_block

    train, val, _, _ = load_block(str(tmp_path))
    # constant 128 input => constant normalized output regardless of channel 4
    expected = (128.0 / 255.0) * 2.0 - 1.0
    np.testing.assert_allclose(train.data, expected, atol=1e-5)
    np.testing.assert_allclose(val.data, expected, atol=1e-5)

"""Dataset readers (TUM/ETH3D/KITTI) against synthetic on-disk sequences."""

import os

import numpy as np
import pytest

from kornia_tpu.io.datasets import (KittiOdometrySequence, TUMSequence,
                                    associate_timestamps, read_kitti_poses,
                                    read_tum_rgbd, read_tum_trajectory)


def _write_tum_sequence(root, n=8):
    os.makedirs(root / "rgb", exist_ok=True)
    os.makedirs(root / "depth", exist_ok=True)
    rng = np.random.default_rng(0)
    with open(root / "rgb.txt", "w") as fr, \
            open(root / "depth.txt", "w") as fd, \
            open(root / "groundtruth.txt", "w") as fg:
        fr.write("# color images\n")
        fd.write("# depth images\n")
        fg.write("# ground truth\n")
        for i in range(n):
            t = 100.0 + i * 0.1
            img = (rng.random((6, 8, 3)) * 255).astype(np.uint8)
            _write_png(root / "rgb" / f"{i}.png", img)
            _write_png(root / "depth" / f"{i}.png", img[..., :1])
            fr.write(f"{t:.4f} rgb/{i}.png\n")
            fd.write(f"{t + 0.005:.4f} depth/{i}.png\n")
            # trajectory: translate along x, identity rotation (qx qy qz qw)
            fg.write(f"{t + 0.002:.4f} {0.1 * i:.3f} 0 0 0 0 0 1\n")
    return n


def _write_png(path, arr):
    # minimal dependency-free PNG writer via our own io
    from kornia_tpu.io.io import write_image
    import jax.numpy as jnp
    if arr.ndim == 3 and arr.shape[-1] in (1, 3):
        arr = np.moveaxis(arr, -1, 0)
    if arr.shape[0] == 1:
        arr = np.repeat(arr, 3, axis=0)
    write_image(str(path), jnp.asarray(arr))


def test_read_tum_trajectory(tmp_path):
    p = tmp_path / "gt.txt"
    p.write_text("# comment\n1.0 1 2 3 0 0 0 1\n2.0 4 5 6 0 0 0.7071 0.7071\n")
    tr = read_tum_trajectory(str(p))
    assert len(tr) == 2
    np.testing.assert_allclose(tr.positions[0], [1, 2, 3])
    # wxyz ordering: qw first
    np.testing.assert_allclose(tr.quaternions_wxyz[1],
                               [0.7071, 0, 0, 0.7071])


def test_associate_timestamps():
    ta = np.array([1.0, 2.0, 3.0])
    tb = np.array([1.01, 2.5, 3.005])
    ia, ib = associate_timestamps(ta, tb, max_dt=0.02)
    np.testing.assert_array_equal(ia, [0, 2])
    np.testing.assert_array_equal(ib, [0, 2])


def test_tum_sequence_windows(tmp_path):
    n = _write_tum_sequence(tmp_path)
    rgb, depth, gt = read_tum_rgbd(str(tmp_path))
    assert len(rgb) == len(depth) == len(gt) == n
    seq = TUMSequence(str(tmp_path), window=4, stride=2)
    assert len(seq) >= 2
    w0 = seq[0]
    assert w0["images"].shape[0] == 4
    assert w0["positions"].shape == (4, 3)
    np.testing.assert_allclose(w0["positions"][:, 0],
                               [0.0, 0.1, 0.2, 0.3], atol=1e-6)
    w1 = seq[1]
    np.testing.assert_allclose(w1["positions"][0, 0], 0.2, atol=1e-6)


def test_kitti_poses(tmp_path):
    # two poses: identity and +1m x
    rows = np.zeros((2, 12))
    rows[:, 0] = rows[:, 5] = rows[:, 10] = 1.0
    rows[1, 3] = 1.0
    np.savetxt(tmp_path / "00.txt", rows)
    R, t = read_kitti_poses(str(tmp_path / "00.txt"))
    assert R.shape == (2, 3, 3) and t.shape == (2, 3)
    np.testing.assert_allclose(R[0], np.eye(3))
    np.testing.assert_allclose(t[1], [1, 0, 0])


def test_kitti_sequence(tmp_path):
    img_dir = tmp_path / "image_2"
    os.makedirs(img_dir)
    rng = np.random.default_rng(1)
    for i in range(5):
        _write_png(img_dir / f"{i:06d}.png",
                   (rng.random((6, 8, 3)) * 255).astype(np.uint8))
    rows = np.zeros((5, 12))
    rows[:, 0] = rows[:, 5] = rows[:, 10] = 1.0
    rows[:, 3] = np.arange(5)
    np.savetxt(tmp_path / "poses.txt", rows)
    seq = KittiOdometrySequence(str(img_dir), str(tmp_path / "poses.txt"),
                                window=3)
    assert len(seq) == 3
    w = seq[1]
    assert w["images"].shape[0] == 3
    np.testing.assert_allclose(w["t"][:, 0], [1, 2, 3])

"""Native C++ dataloader vs the Python/cv2 path on a synthetic TUM dir."""

import os

import numpy as np
import pytest

from vslam_tpu.data import loader as loader_mod


def write_tum_dir(tmp_path, n=4, w=64, h=48):
    import cv2

    rng = np.random.default_rng(0)
    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    rgb_lines, depth_lines, assoc = [], [], []
    for i in range(n):
        ts = 1000.0 + i * 0.1
        rgb = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        depth = rng.integers(0, 30000, (h, w), dtype=np.uint16)
        rp = f"rgb/{ts:.6f}.png"
        dp = f"depth/{ts:.6f}.png"
        cv2.imwrite(str(tmp_path / rp), rgb[..., ::-1])  # cv2 writes BGR
        cv2.imwrite(str(tmp_path / dp), depth)
        rgb_lines.append(f"{ts:.6f} {rp}")
        depth_lines.append(f"{ts:.6f} {dp}")
        assoc.append(f"{ts:.6f} {rp} {ts:.6f} {dp}")
    (tmp_path / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines) + "\n")
    (tmp_path / "depth.txt").write_text("# depth\n" + "\n".join(depth_lines) + "\n")
    (tmp_path / "associations.txt").write_text("\n".join(assoc) + "\n")
    (tmp_path / "groundtruth.txt").write_text(
        "# gt\n" + "\n".join(
            f"{1000.0 + i * 0.1:.6f} {0.1 * i:.4f} 0 0 0 0 0 1" for i in range(n)
        ) + "\n"
    )
    (tmp_path / "accelerometer.txt").write_text(
        "# accel\n" + "\n".join(
            f"{1000.0 + i * 0.05:.6f} 0.1 9.8 0.2" for i in range(2 * n)
        ) + "\n"
    )
    return tmp_path


@pytest.fixture
def tum_dir(tmp_path):
    return write_tum_dir(tmp_path)


def test_python_loader(tum_dir):
    ld = loader_mod.PythonSequenceLoader(str(tum_dir), width=64, height=48)
    assert len(ld) == 4
    rgb, depth, ts = ld.get(0)
    assert rgb.shape == (48, 64, 3)
    assert depth.shape == (48, 64)
    assert abs(ts - 1000.0) < 1e-6


@pytest.mark.skipif(
    not os.path.exists(loader_mod._LIB_PATH), reason="native lib not built"
)
def test_native_matches_python(tum_dir):
    nat = loader_mod.NativeSequenceLoader(str(tum_dir), width=64, height=48)
    py = loader_mod.PythonSequenceLoader(str(tum_dir), width=64, height=48)
    assert len(nat) == len(py) == 4
    for i in range(4):
        rn, dn, tn = nat.get(i)
        rp, dp, tp = py.get(i)
        np.testing.assert_array_equal(rn, rp)
        np.testing.assert_allclose(dn, dp, atol=1e-6)
        assert abs(tn - tp) < 1e-9
    nat.close()


@pytest.mark.skipif(
    not os.path.exists(loader_mod._LIB_PATH), reason="native lib not built"
)
def test_native_prefetch_stream(tum_dir):
    nat = loader_mod.NativeSequenceLoader(str(tum_dir), width=64, height=48, workers=2)
    frames = list(nat.frames(step=2))
    assert len(frames) == 2
    assert frames[1][2] > frames[0][2]
    nat.close()


def test_tum_parser_loads_gt_and_accel(tum_dir):
    from vslam_tpu.data import tum

    seq = tum.load_sequence(str(tum_dir))
    assert len(seq) == 4
    assert seq.gt is not None and seq.gt.shape == (4, 8)
    assert seq.accel is not None and seq.accel.shape == (8, 4)
    assert seq.frames[0].depth_path is not None


def test_kitti_loader(tmp_path):
    import cv2

    from vslam_tpu.data import kitti

    seq_dir = tmp_path / "sequences" / "07"
    (seq_dir / "image_0").mkdir(parents=True)
    (tmp_path / "poses").mkdir()
    rng = np.random.default_rng(0)
    n = 5
    for i in range(n):
        cv2.imwrite(str(seq_dir / "image_0" / f"{i:06d}.png"),
                    rng.integers(0, 255, (40, 60), dtype=np.uint8))
    (seq_dir / "times.txt").write_text("\n".join(f"{i * 0.1:.6f}" for i in range(n)))
    (seq_dir / "calib.txt").write_text(
        "P0: 700.0 0.0 30.0 0.0 0.0 700.0 20.0 0.0 0.0 0.0 1.0 0.0\n"
    )
    (tmp_path / "poses" / "07.txt").write_text(
        "\n".join(
            " ".join(str(v) for v in [1, 0, 0, 0.1 * i, 0, 1, 0, 0, 0, 0, 1, 0])
            for i in range(n)
        )
    )
    seq = kitti.load_sequence(str(seq_dir))
    assert len(seq) == n
    assert seq.fx == 700.0 and seq.cx == 30.0
    assert seq.gt_t is not None and abs(seq.gt_t[3, 0] - 0.3) < 1e-6
    img = kitti.load_gray(seq.image_paths[0])
    assert img.shape == (40, 60)

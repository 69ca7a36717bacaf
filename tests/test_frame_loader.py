"""Native frame loader: decode/warp parity with the cv2 path + ordering."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from onepose_tpu.native.frame_loader import (
    FrameLoader,
    native_available,
    read_gray,
)


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    root = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(0)
    paths = []
    # Smooth-ish content so JPEG loss stays small.
    base = cv2.GaussianBlur(
        (rng.random((96, 128, 3)) * 255).astype(np.uint8), (11, 11), 3.0
    )
    for i in range(4):
        img = np.roll(base, i * 7, axis=1)
        p = root / f"f{i}.png"
        cv2.imwrite(str(p), img)
        paths.append(str(p))
    jp = root / "f4.jpg"
    cv2.imwrite(str(jp), base, [cv2.IMWRITE_JPEG_QUALITY, 98])
    paths.append(str(jp))
    return paths


def test_native_lib_builds():
    assert native_available(), "native frame loader should build in CI"


def test_read_gray_parity(images):
    for p in images:
        ours = read_gray(p)
        assert ours is not None, p
        ref = cv2.imread(p, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
        assert ours.shape == ref.shape
        # BT.601 in float vs cv2's fixed point (and libjpeg DCT noise).
        tol = 2.5 / 255.0 if p.endswith(".jpg") else 1.5 / 255.0
        assert np.abs(ours - ref).max() < tol, p


def test_loader_ordering_and_shapes(images):
    frames = list(FrameLoader(images, n_threads=3, queue_cap=2))
    assert [i for i, _ in frames] == list(range(len(images)))
    for (_, f), p in zip(frames, images):
        ref = cv2.imread(p, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
        assert f.shape == ref.shape
        assert np.abs(f - ref).max() < 2.5 / 255.0


def test_loader_affine_warp_matches_cv2(images):
    rng = np.random.default_rng(1)
    out_hw = (64, 80)
    affs = []
    for _ in images:
        ang = rng.uniform(-0.3, 0.3)
        s = rng.uniform(0.8, 1.6)
        c, si = np.cos(ang) * s, np.sin(ang) * s
        affs.append(
            np.array(
                [[c, -si, rng.uniform(0, 20)], [si, c, rng.uniform(0, 10)]],
                np.float32,
            )
        )
    affs = np.stack(affs)
    frames = dict(FrameLoader(images, out_hw=out_hw, affines=affs))
    for i, p in enumerate(images):
        ref_img = cv2.imread(p, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255
        ref = cv2.warpAffine(
            ref_img,
            affs[i],
            (out_hw[1], out_hw[0]),
            flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
        )
        # cv2 interpolates in 5-bit fixed point; allow ~2 lsb.
        assert np.abs(frames[i] - ref).max() < 3.0 / 255.0, p


def test_loader_resize(images):
    out_hw = (48, 64)
    frames = dict(FrameLoader(images[:2], out_hw=out_hw))
    for i in range(2):
        ref_img = (
            cv2.imread(images[i], cv2.IMREAD_GRAYSCALE).astype(np.float32)
            / 255.0
        )
        ref = cv2.resize(
            ref_img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR
        )
        assert frames[i].shape == out_hw
        assert np.abs(frames[i] - ref).max() < 3.0 / 255.0


def test_decode_failure_yields_none(tmp_path, images):
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"\x89PNG this is not a real png")
    missing = str(tmp_path / "missing.png")
    frames = list(FrameLoader([images[0], str(bad), missing]))
    assert frames[0][1] is not None
    assert frames[1][1] is None
    assert frames[2][1] is None


def test_fallback_path_matches(images):
    out_hw = (64, 80)
    aff = np.tile(
        np.array([[1.2, 0.1, 5.0], [-0.1, 1.2, 2.0]], np.float32),
        (len(images), 1, 1),
    )
    native = FrameLoader(images, out_hw=out_hw, affines=aff)
    fb = FrameLoader(images, out_hw=out_hw, affines=aff)
    fb._native = False
    for (i, a), (j, b) in zip(native, fb):
        assert i == j
        assert np.abs(a - b).max() < 3.0 / 255.0

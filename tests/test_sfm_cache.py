"""HDF5 feature/match cache: reference-layout round trips + resume."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from onepose_tpu.sfm.cache import (  # noqa: E402
    CachedPairMatcher,
    load_features_h5,
    load_matches_h5,
    names_to_pair,
    read_fingerprint,
    save_features_h5,
    save_matches_h5,
)


def _fake_feats(rng, F=3, N=10, C=16):
    feats = {
        "keypoints": rng.uniform(0, 100, (F, N, 2)).astype(np.float32),
        "descriptors": rng.normal(size=(F, N, C)).astype(np.float32),
        "scores": rng.uniform(size=(F, N)).astype(np.float32),
        "mask": np.zeros((F, N), bool),
    }
    for i in range(F):
        feats["mask"][i, : 4 + i] = True
    return feats


class TestFeatureCache:
    def test_round_trip(self, tmp_path):
        rng = np.random.default_rng(0)
        feats = _fake_feats(rng)
        names = ["0.png", "1.png", "2.png"]
        path = str(tmp_path / "feats.h5")
        save_features_h5(
            path, names, feats["keypoints"], feats["descriptors"],
            feats["scores"], feats["mask"], (64, 48),
        )
        loaded = load_features_h5(path, names, pad_to=10)
        assert loaded["image_hw"] == (64, 48)
        for i in range(3):
            m = feats["mask"][i]
            assert np.array_equal(loaded["mask"][i], m)
            np.testing.assert_allclose(
                loaded["keypoints"][i][m], feats["keypoints"][i][m]
            )
            np.testing.assert_allclose(
                loaded["descriptors"][i][m], feats["descriptors"][i][m],
                rtol=1e-6,
            )

    def test_reference_disk_layout(self, tmp_path):
        """On disk: per-image group, descriptors [C, N] (ragged), like the
        reference extractor output (extract_features.py:44-59)."""
        rng = np.random.default_rng(1)
        feats = _fake_feats(rng, F=1, N=8, C=4)
        path = str(tmp_path / "feats.h5")
        save_features_h5(
            path, ["seq/frame0.png"], feats["keypoints"],
            feats["descriptors"], feats["scores"], feats["mask"], (32, 32),
        )
        with h5py.File(path, "r") as f:
            grp = f["seq/frame0.png"]
            n_valid = int(feats["mask"][0].sum())
            assert grp["keypoints"].shape == (n_valid, 2)
            assert grp["descriptors"].shape == (4, n_valid)
            assert tuple(grp["image_size"][()]) == (32, 32)
        # Auto-discovered names (nested group path) also load.
        loaded = load_features_h5(path)
        assert loaded["image_names"] == ["seq/frame0.png"]

    def test_fingerprint_round_trip(self, tmp_path):
        rng = np.random.default_rng(5)
        feats = _fake_feats(rng, F=1)
        path = str(tmp_path / "feats.h5")
        save_features_h5(
            path, ["a.png"], feats["keypoints"], feats["descriptors"],
            feats["scores"], feats["mask"], (8, 8), fingerprint="cfg-v1",
        )
        assert read_fingerprint(path) == "cfg-v1"
        # Reference-produced caches carry no fingerprint attribute.
        path2 = str(tmp_path / "ref.h5")
        save_features_h5(
            path2, ["a.png"], feats["keypoints"], feats["descriptors"],
            feats["scores"], feats["mask"], (8, 8),
        )
        assert read_fingerprint(path2) is None

    def test_reference_fullpath_keys_resolved_by_basename(self, tmp_path):
        """Reference caches key groups by full relative image path
        (extract_features.py:44-59); lookups by basename must resolve to
        the unique suffix match instead of raising."""
        rng = np.random.default_rng(6)
        feats = _fake_feats(rng, F=2)
        path = str(tmp_path / "feats.h5")
        save_features_h5(
            path, ["color/0.png", "color/1.png"], feats["keypoints"],
            feats["descriptors"], feats["scores"], feats["mask"], (8, 8),
        )
        loaded = load_features_h5(path, ["0.png", "1.png"], pad_to=10)
        for i in range(2):
            m = feats["mask"][i]
            np.testing.assert_allclose(
                loaded["keypoints"][i][m], feats["keypoints"][i][m]
            )
        # Ambiguous basenames still raise.
        path_amb = str(tmp_path / "amb.h5")
        f4 = _fake_feats(rng, F=2)
        save_features_h5(
            path_amb, ["seq1/0.png", "seq2/0.png"], f4["keypoints"],
            f4["descriptors"], f4["scores"], f4["mask"], (8, 8),
        )
        with pytest.raises(KeyError):
            load_features_h5(path_amb, ["0.png"])

    def test_stale_cache_raises(self, tmp_path):
        rng = np.random.default_rng(2)
        feats = _fake_feats(rng)
        path = str(tmp_path / "feats.h5")
        save_features_h5(
            path, ["a.png", "b.png", "c.png"], feats["keypoints"],
            feats["descriptors"], feats["scores"], feats["mask"], (8, 8),
        )
        with pytest.raises(KeyError):
            load_features_h5(path, ["a.png", "MISSING.png"])


class TestMatchCache:
    def test_round_trip_and_reverse(self, tmp_path):
        N = 6
        pairs = np.array([[0, 1], [1, 2]])
        names = ["a.png", "b.png", "c.png"]
        matches0 = np.array(
            [[2, -1, 0, -1, 5, -1], [-1, 3, -1, 1, -1, -1]], np.int64
        )
        path = str(tmp_path / "matches.h5")
        save_matches_h5(path, pairs, names, matches0)
        out = load_matches_h5(path, pairs, names, N)
        np.testing.assert_array_equal(out, matches0)

        # Reverse orientation is inverted on load.
        rev = load_matches_h5(path, np.array([[1, 0]]), names, N)
        exp = np.full(N, -1)
        for s, t in enumerate(matches0[0]):
            if t >= 0:
                exp[t] = s
        np.testing.assert_array_equal(rev[0], exp)

        with h5py.File(path, "r") as f:
            assert names_to_pair("a.png", "b.png") in f
            assert f[names_to_pair("a.png", "b.png")]["matches0"].dtype == np.int16

    def test_missing_pair_raises(self, tmp_path):
        path = str(tmp_path / "matches.h5")
        save_matches_h5(
            path, np.array([[0, 1]]), ["a", "b", "c"],
            np.array([[1, -1]], np.int64),
        )
        with pytest.raises(KeyError):
            load_matches_h5(path, np.array([[0, 2]]), ["a", "b", "c"], 2)


class TestCachedPairMatcher:
    def test_resume_skips_cached_pairs(self, tmp_path):
        N = 5
        names = ["a", "b", "c", "d"]
        calls = []

        def matcher(pairs):
            calls.append(np.asarray(pairs).copy())
            out = np.full((len(pairs), N), -1, np.int64)
            out[:, 0] = pairs[:, 1] % N  # deterministic fake
            return out

        path = str(tmp_path / "matches.h5")
        cm = CachedPairMatcher(matcher, path, names, N)
        p1 = np.array([[0, 1], [1, 2]])
        r1 = cm(p1)
        assert len(calls) == 1 and len(calls[0]) == 2

        # Second call: one cached pair + one new — only the new one computed.
        p2 = np.array([[0, 1], [2, 3]])
        r2 = cm(p2)
        assert len(calls) == 2
        np.testing.assert_array_equal(calls[1], np.array([[2, 3]]))
        np.testing.assert_array_equal(r2[0], r1[0])

        # Third call, all cached: the wrapped matcher is never invoked.
        def exploding(pairs):
            raise AssertionError("should not be called")

        cm2 = CachedPairMatcher(exploding, path, names, N)
        r3 = cm2(np.concatenate([p1, p2[1:]]))
        np.testing.assert_array_equal(r3[:2], r1)

    def test_fingerprint_mismatch_drops_cache(self, tmp_path):
        N = 4
        names = ["a", "b"]
        calls = []

        def matcher(pairs):
            calls.append(np.asarray(pairs).copy())
            out = np.full((len(pairs), N), -1, np.int64)
            out[:, 0] = 1
            return out

        path = str(tmp_path / "matches.h5")
        pairs = np.array([[0, 1]])
        cm = CachedPairMatcher(matcher, path, names, N, fingerprint="v1")
        cm(pairs)
        assert read_fingerprint(path) == "v1" and len(calls) == 1

        # Same fingerprint: cache is reused (no new matcher calls).
        CachedPairMatcher(matcher, path, names, N, fingerprint="v1")(pairs)
        assert len(calls) == 1

        # Different fingerprint (e.g. features re-extracted): cache dropped,
        # pair recomputed, new fingerprint persisted.
        CachedPairMatcher(matcher, path, names, N, fingerprint="v2")(pairs)
        assert len(calls) == 2
        assert read_fingerprint(path) == "v2"

import numpy as np
import pytest

from scl_slam_tpu.io import native_loader


@pytest.fixture(scope="module")
def bin_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("scans")
    rng = np.random.RandomState(0)
    paths, truths = [], []
    for k in range(5):
        n = 100 + 50 * k
        pts = rng.uniform(-50, 50, (n, 4)).astype(np.float32)
        p = d / f"{k:06d}.bin"
        pts.tofile(p)
        paths.append(str(p))
        truths.append(pts[:, :3])
    return paths, truths


class TestNativeLoader:
    def test_builds(self):
        assert native_loader.load_library() is not None

    def test_reads_in_order(self, bin_files):
        paths, truths = bin_files
        loader = native_loader.NativeScanLoader(paths, capacity=512, workers=3)
        out = list(loader)
        assert len(out) == 5
        for (xyz, n), truth in zip(out, truths):
            assert n == len(truth)
            np.testing.assert_array_equal(xyz[:n], truth)
            assert np.all(xyz[n:] == 1e6)
        loader.close()

    def test_truncates_at_capacity(self, bin_files):
        paths, truths = bin_files
        loader = native_loader.NativeScanLoader(paths, capacity=120)
        (xyz, n) = next(iter(loader))
        assert n == 100  # first file fits
        loader.close()
        loader = native_loader.NativeScanLoader([paths[4]], capacity=120)
        (xyz, n) = next(iter(loader))
        assert n == 120  # truncated from 300
        np.testing.assert_array_equal(xyz, truths[4][:120])
        loader.close()

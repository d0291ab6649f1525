"""Native C++ core vs numpy oracle agreement."""
import numpy as np
import pytest

from pxmcmc_tpu import native
from pxmcmc_tpu.ops import paths, wigner

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_wigner_native_matches_numpy():
    thetas = np.linspace(0.05, 3.1, 9)
    for L, n in [(12, 0), (12, -2), (9, 2), (7, 1)]:
        ours = wigner.wigner_d_table(L, n, thetas)
        nat = native.wigner_d_table_native(L, n, thetas)
        assert np.allclose(nat, ours, atol=1e-13), (L, n, np.abs(nat - ours).max())


def test_path_matrix_native_matches_numpy():
    rng = np.random.default_rng(0)
    starts = np.stack([rng.uniform(-80, 80, 5), rng.uniform(-170, 170, 5)], axis=1)
    stops = np.stack([rng.uniform(-80, 80, 5), rng.uniform(-170, 170, 5)], axis=1)
    L = 16
    a = paths.build_path_matrix(starts, stops, L, use_native=False)
    b = native.path_matrix_native(starts, stops, L)
    assert np.allclose(a, b, atol=1e-12)
    # rows are "average" weighted: sum to 1
    assert np.allclose(a.sum(axis=1), 1.0)
    assert np.allclose(b.sum(axis=1), 1.0)


def test_path_matrix_equator_quadrature():
    """A full equatorial path must touch only the equatorial ring."""
    L = 16
    row = paths.build_path_matrix(
        [[0.0, 0.0]], [[0.0, 179.0]], L, use_native=False
    )[0].reshape(L, 2 * L - 1)
    ring = np.argmax(row.sum(axis=1))
    thetas, _ = paths.sampling.sample_positions(L)
    assert abs(thetas[ring] - np.pi / 2) < np.pi / L

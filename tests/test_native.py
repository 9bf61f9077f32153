"""Native C++ path-matrix kernel vs the pure-numpy reference."""

import numpy as np
import pytest

from adjointnonlinearraytracing_tpu.native import loader
from adjointnonlinearraytracing_tpu.pathmatrix import path_matrix as PM


def _py_phi(sp, ep, v, dim, res, int_res):
    """Force the numpy fallback path."""
    num_rays, dimension = sp.shape
    spline_func = PM.get_linear_path
    box_dim = dim / max(1, res)
    from scipy.sparse import coo_matrix
    data_chunks, row_chunks, col_chunks = [], [], []
    p_pre = spline_func(sp, v, ep, v, 0.0)
    ind_pre = PM.which_voxel(p_pre, box_dim, res)
    dist = np.zeros(num_rays)
    for j in range(int_res):
        p_cur = spline_func(sp, v, ep, v, (j + 1) / int_res)
        ind_cur = PM.which_voxel(p_cur, box_dim, res)
        changed = ind_pre != ind_cur
        if j == int_res - 1:
            changed = np.ones(num_rays, dtype=bool)
        dist = dist + np.sqrt(((p_cur - p_pre) ** 2).sum(1))
        data_chunks.append(dist[changed])
        col_chunks.append(ind_pre[changed])
        row_chunks.append(np.flatnonzero(changed))
        dist[changed] = 0.0
        ind_pre = ind_cur.copy()
        p_pre = p_cur
    phi = coo_matrix((np.concatenate(data_chunks),
                      (np.concatenate(row_chunks), np.concatenate(col_chunks))),
                     shape=(num_rays, res ** dimension)).tocsr()
    phi.sum_duplicates()
    return phi


class TestNative:
    def test_builds(self):
        lib = loader.get_lib()
        if lib is None:
            pytest.skip("no g++ toolchain")

    def test_matches_python(self):
        if loader.get_lib() is None:
            pytest.skip("no g++ toolchain")
        rng = np.random.default_rng(0)
        n = 64
        sp = rng.uniform(0.05, 0.95, (n, 3))
        ep = rng.uniform(0.05, 0.95, (n, 3))
        v = ep - sp
        res, int_res = 8, 50
        phi_native = PM.construct_voxel_matrix(sp, v, ep, v, 1.0, res,
                                               spline="linear", int_res=int_res)
        phi_py = _py_phi(sp, ep, v, 1.0, res, int_res)
        diff = (phi_native - phi_py)
        assert abs(diff).max() < 1e-9

    def test_hermite_matches_python(self, monkeypatch):
        if loader.get_lib() is None:
            pytest.skip("no g++ toolchain")
        rng = np.random.default_rng(1)
        n = 32
        sp = rng.uniform(0.1, 0.9, (n, 3))
        ep = rng.uniform(0.1, 0.9, (n, 3))
        sd = rng.normal(0, 0.2, (n, 3))
        ed = rng.normal(0, 0.2, (n, 3))
        phi_native = PM.construct_voxel_matrix(sp, sd, ep, ed, 1.0, 8,
                                               spline="hermite", int_res=60)
        monkeypatch.setattr(loader, "accumulate_paths", lambda *a, **k: None)
        phi_py = PM.construct_voxel_matrix(sp, sd, ep, ed, 1.0, 8,
                                           spline="hermite", int_res=60)
        assert abs(phi_native - phi_py).max() < 1e-9

    def test_true_path_matches_python(self, monkeypatch):
        if loader.get_lib() is None:
            pytest.skip("no g++ toolchain")
        rng = np.random.default_rng(2)
        n, steps = 16, 12
        # recorded trajectories: smooth per-ray curves, flattened so that
        # ray r's step s lives at row s*n + r (get_true_path layout)
        traj = np.empty((steps, n, 3))
        a = rng.uniform(0.1, 0.4, (n, 3))
        b = rng.uniform(0.6, 0.9, (n, 3))
        bend = rng.normal(0, 0.05, (n, 3))
        for s in range(steps):
            t = s / (steps - 1)
            traj[s] = (1 - t) * a + t * b + np.sin(np.pi * t) * bend
        path = traj.reshape(steps * n, 3)
        pstart = np.zeros(n)
        pend = np.full(n, float(steps - 1))
        sp, ep = traj[0], traj[-1]
        v = ep - sp
        phi_native = PM.construct_voxel_matrix(
            sp, v, ep, v, 1.0, 8, spline="true", int_res=70,
            path=(path, pstart, pend))
        monkeypatch.setattr(loader, "accumulate_paths", lambda *a, **k: None)
        phi_py = PM.construct_voxel_matrix(
            sp, v, ep, v, 1.0, 8, spline="true", int_res=70,
            path=(path, pstart, pend))
        assert abs(phi_native - phi_py).max() < 1e-9

    def test_row_sums_are_chord_lengths(self):
        if loader.get_lib() is None:
            pytest.skip("no g++ toolchain")
        sp = np.array([[0.05, 0.5, 0.5]])
        ep = np.array([[0.95, 0.5, 0.5]])
        v = ep - sp
        phi = PM.construct_voxel_matrix(sp, v, ep, v, 1.0, 16,
                                        spline="linear", int_res=128)
        np.testing.assert_allclose(np.asarray(phi.sum(axis=1)).ravel(), 0.9,
                                   rtol=1e-9)

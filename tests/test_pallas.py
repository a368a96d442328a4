"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raycore_tpu as rc
from raycore_tpu.ops.pallas_brute import (closest_hit_brute_pallas,
                                          make_tri_table, RAY_TILE,
                                          TRI_BLOCK)


@pytest.mark.slow
def test_pallas_brute_matches_xla_brute(rng):
    tris = rc.sphere_mesh(radius=1.0, n_theta=12, n_phi=24)
    o = rng.uniform(-2, 2, (300, 3)).astype(np.float32)
    o[:, 2] = -4.0
    d = np.zeros((300, 3), np.float32)
    d[:, 2] = 1.0
    rays = rc.Ray.create(o=jnp.asarray(o), d=jnp.asarray(d))
    rp = closest_hit_brute_pallas(tris, rays)
    rb = rc.closest_hit_brute(tris, rays)
    np.testing.assert_array_equal(np.asarray(rp.hit), np.asarray(rb.hit))
    h = np.asarray(rp.hit)
    assert h.sum() > 20
    np.testing.assert_allclose(np.asarray(rp.t)[h], np.asarray(rb.t)[h],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(rp.prim_idx),
                                  np.asarray(rb.prim_idx))


def test_pallas_brute_t_range_and_sentinel(rng):
    tris = rc.plane_mesh(center=(0, 0, 0), u=(1, 0, 0), v=(0, 1, 0))
    r_far = rc.Ray.create(o=[0.1, 0.1, -5.0], d=[0.0, 0, 1.0], t_max=4.0)
    res = closest_hit_brute_pallas(tris, r_far)
    assert not bool(res.hit)
    assert np.all(np.asarray(res.triangle.vertices) == 0)
    r_min = rc.Ray.create(o=[0.1, 0.1, -5.0], d=[0.0, 0, 1.0], t_min=6.0)
    assert not bool(closest_hit_brute_pallas(tris, r_min).hit)
    r_ok = rc.Ray.create(o=[0.1, 0.1, -5.0], d=[0.0, 0, 1.0])
    res2 = closest_hit_brute_pallas(tris, r_ok)
    assert bool(res2.hit) and float(res2.t) == pytest.approx(5.0)


def test_tri_table_padding():
    tris = rc.box_mesh()          # 12 tris -> pads to TRI_BLOCK
    table = make_tri_table(tris)
    assert table.shape == (9, TRI_BLOCK)
    assert np.all(np.asarray(table[:, 12:]) == 0)


@pytest.mark.slow
def test_pallas_brute_batch_shapes(rng):
    tris = rc.box_mesh()
    o = rng.uniform(-2, 2, (7, 5, 3)).astype(np.float32)
    o[..., 2] = -4.0
    d = np.zeros((7, 5, 3), np.float32)
    d[..., 2] = 1.0
    rays = rc.Ray.create(o=jnp.asarray(o), d=jnp.asarray(d))
    res = closest_hit_brute_pallas(tris, rays)
    assert res.hit.shape == (7, 5)
    rb = rc.closest_hit_brute(tris, rays)
    np.testing.assert_array_equal(np.asarray(res.hit), np.asarray(rb.hit))

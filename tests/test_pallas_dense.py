"""Pallas worklist-kernel engine tests (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raycore_tpu as rc
from raycore_tpu.accel.dense import build_dense
from raycore_tpu.ops.pallas_dense import (build_worklist,
                                          closest_hit_dense_pallas)


@pytest.fixture(scope="module")
def scene():
    tris = rc.displaced_grid_mesh(n=32, extent=2.0, amplitude=0.3)
    return build_dense(tris, cluster_size=64)


def test_worklist_structure():
    entry = jnp.asarray([[0.5, jnp.inf, 1.0],
                         [jnp.inf, jnp.inf, jnp.inf],
                         [2.0, 3.0, jnp.inf]])
    tids, cids, total = build_worklist(entry, max_pairs=8)
    assert int(total) == 4
    t = np.asarray(tids)
    c = np.asarray(cids)
    # Valid pairs sorted tile-major; padding points at the dummy tile (3).
    np.testing.assert_array_equal(t[:4], [0, 0, 2, 2])
    np.testing.assert_array_equal(c[:4], [0, 2, 0, 1])
    assert np.all(t[4:] == 3)
    assert np.all(np.diff(t) >= 0)


@pytest.mark.parametrize("cap", [8, 64, 4096])
def test_compact_indices_lowerings_agree(cap, monkeypatch):
    """The argsort and cumsum+scatter lowerings of compact_indices must
    produce identical in-order selections (incl. overflow truncation)."""
    from raycore_tpu.ops.pallas_dense import compact_indices
    rng = np.random.default_rng(7)
    flat = jnp.asarray(rng.random(1000) < 0.13)
    outs = {}
    for mode in ("argsort", "scatter"):
        monkeypatch.setenv("RAYCORE_WORKLIST", mode)
        sel, total = compact_indices(flat, cap)
        outs[mode] = (np.asarray(sel), int(total))
    n_true = int(np.asarray(flat).sum())
    for mode, (sel, total) in outs.items():
        assert total == n_true, mode
        k = min(cap, n_true)
        # First k entries are the first k True positions, in order.
        np.testing.assert_array_equal(
            sel[:k], np.flatnonzero(np.asarray(flat))[:k], err_msg=mode)
    # Beyond the count the two lowerings may differ; callers mask there.


def test_pallas_worklist_matches_brute(scene):
    xs = jnp.linspace(-0.9, 0.9, 32)
    X, Y = jnp.meshgrid(xs, xs, indexing="ij")
    o = jnp.stack([X, Y, jnp.full_like(X, 2.0)], -1).reshape(-1, 3)
    rays = rc.Ray.create(o=o, d=jnp.broadcast_to(jnp.array([0.0, 0, -1.0]),
                                                 o.shape))
    r = closest_hit_dense_pallas(scene, rays, tile=128)
    rb = rc.closest_hit_brute(scene.prims, rays)
    np.testing.assert_array_equal(np.asarray(r.hit), np.asarray(rb.hit))
    m = np.asarray(r.hit)
    assert m.all()
    np.testing.assert_allclose(np.asarray(r.t)[m], np.asarray(rb.t)[m],
                               rtol=1e-4, atol=1e-4)
    # Differing winners are shared-edge t-ties (t asserted equal above);
    # tie-breaking happens in sorted table space but ids report original
    # order, so oracle/engine tie winners may differ.
    assert (np.asarray(r.prim_idx)[m] == np.asarray(rb.prim_idx)[m]).mean() \
        > 0.97
    # Triangle payload fetched through the packed rows matches (compare
    # where the same triangle won — edge ties may pick either neighbor).
    same = m & (np.asarray(r.prim_idx) == np.asarray(rb.prim_idx))
    np.testing.assert_allclose(np.asarray(r.triangle.vertices)[same],
                               np.asarray(rb.triangle.vertices)[same],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(r.triangle.metadata)[same],
                                  np.asarray(rb.triangle.metadata)[same])


@pytest.mark.slow
def test_pallas_worklist_incoherent(scene, rng):
    n = 300
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    tgt = np.asarray(scene.prims.vertices[
        rng.integers(0, scene.prims.vertices.shape[0], n)]).mean(1)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = rc.Ray.create(o=jnp.asarray(o), d=jnp.asarray(d))
    r = closest_hit_dense_pallas(scene, rays, tile=64,
                                 max_pairs_per_tile=64)
    rb = rc.closest_hit_brute(scene.prims, rays)
    np.testing.assert_array_equal(np.asarray(r.hit), np.asarray(rb.hit))
    m = np.asarray(r.hit)
    np.testing.assert_allclose(np.asarray(r.t)[m], np.asarray(rb.t)[m],
                               rtol=1e-3, atol=1e-3)


def test_pallas_worklist_t_ranges(scene):
    miss = closest_hit_dense_pallas(
        scene, rc.Ray.create(o=[9.0, 9, 2.0], d=[0.0, 0, -1.0]), tile=8)
    assert not bool(miss.hit)
    assert np.all(np.asarray(miss.triangle.vertices) == 0)
    clipped = closest_hit_dense_pallas(
        scene, rc.Ray.create(o=[0.0, 0, 2.0], d=[0.0, 0, -1.0], t_max=1.0),
        tile=8)
    assert not bool(clipped.hit)


@pytest.mark.slow
def test_overflow_detection(scene):
    o = jnp.zeros((64, 3)).at[:, 2].set(2.0)
    # A spreading bundle (targets fan over the whole scene) so the tile's
    # conservative candidate set must exceed one cluster even with tight
    # tile-layout clusters.
    ang = jnp.linspace(0.0, 2 * jnp.pi, 64, endpoint=False)
    tgt = jnp.stack([jnp.cos(ang), jnp.sin(ang), -jnp.ones_like(ang)], -1)
    d = tgt - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = rc.Ray.create(o=o, d=d)
    with pytest.raises(RuntimeError, match="overflow"):
        closest_hit_dense_pallas(scene, rays, tile=64, max_pairs_per_tile=1,
                                 passes=1)
    # Two-pass pruning usually keeps pass 2 under tiny capacities, but the
    # result must still be correct when it fits.
    r = closest_hit_dense_pallas(scene, rays, tile=64, max_pairs_per_tile=32)
    rb = rc.closest_hit_brute(scene.prims, rays)
    np.testing.assert_array_equal(np.asarray(r.hit), np.asarray(rb.hit))


@pytest.mark.slow
def test_occlusion_kernel_matches_closest(scene, rng):
    from raycore_tpu.ops.pallas_dense import any_hit_dense_pallas_auto
    xs = jnp.linspace(-0.9, 0.9, 24)
    X, Y = jnp.meshgrid(xs, xs, indexing="ij")
    o = jnp.stack([X, Y, jnp.full_like(X, 2.0)], -1).reshape(-1, 3)
    d = jnp.broadcast_to(jnp.array([0.0, 0, -1.0]), o.shape)
    rays = rc.Ray.create(o=o, d=d)
    occ = any_hit_dense_pallas_auto(scene, rays, tile=128)
    rb = rc.closest_hit_brute(scene.prims, rays)
    np.testing.assert_array_equal(np.asarray(occ.hit), np.asarray(rb.hit))
    # Reported occluder is a genuine intersection within [0, t_max]:
    # recompute scalar Moller-Trumbore on the reported prim.
    m = np.asarray(occ.hit)
    prim = np.asarray(occ.prim_idx)[m]
    assert (prim >= 0).all()
    v = np.asarray(scene.prims.vertices)[prim]      # (H, 3, 3)
    oo, dd = np.asarray(o)[m], np.asarray(d)[m]
    e1, e2 = v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]
    s1 = np.cross(dd, e2)
    det = np.einsum("ij,ij->i", s1, e1)
    r = 1.0 / det
    dv = oo - v[:, 0]
    u = np.einsum("ij,ij->i", dv, s1) * r
    s2 = np.cross(dv, e1)
    vv = np.einsum("ij,ij->i", dd, s2) * r
    t = np.einsum("ij,ij->i", e2, s2) * r
    eps = 1e-4
    assert (u >= -eps).all() and (vv >= -eps).all() \
        and (u + vv <= 1 + eps).all() and (t >= 0).all()


def test_occlusion_kernel_t_range(scene):
    from raycore_tpu.ops.pallas_dense import any_hit_dense_pallas_auto
    # Surface max height ~0.3; origin at z=2. t_max=1.0 cannot reach it.
    o = jnp.asarray([[0.1, 0.1, 2.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    short = rc.Ray.create(o=o, d=d, t_max=1.0)
    assert not bool(any_hit_dense_pallas_auto(scene, short, tile=8).hit[0])
    # t_min is forced to 0 (reference any_hit semantics): a t_min beyond
    # the surface still reports occluded.
    late = rc.Ray.create(o=o, d=d, t_min=5.0)
    assert bool(any_hit_dense_pallas_auto(scene, late, tile=8).hit[0])


def test_occlusion_kernel_instance_idx():
    from raycore_tpu.scene.tlas import TLAS
    from raycore_tpu.scene.bake import bake_dense
    from raycore_tpu.ops.pallas_dense import any_hit_dense_pallas_auto
    mgr = TLAS()
    mgr.push(rc.sphere_mesh(radius=1.0, n_theta=10, n_phi=20), None)
    tr = np.eye(3, 4, dtype=np.float32)
    tr[0, 3] = 3.0
    mgr.push(rc.box_mesh(), tr)
    ds = bake_dense(mgr, cluster_size=64)
    o = jnp.asarray([[0.0, 0.0, -4.0], [3.0, 0.0, -4.0],
                     [10.0, 0.0, -4.0]])
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), o.shape)
    occ = any_hit_dense_pallas_auto(ds, rc.Ray.create(o=o, d=d), tile=8)
    np.testing.assert_array_equal(np.asarray(occ.hit), [True, True, False])
    np.testing.assert_array_equal(np.asarray(occ.instance_idx), [0, 1, -1])

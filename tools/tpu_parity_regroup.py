"""On-device (Mosaic-compiled) parity check: regroup engine vs brute
oracle, moderate scale. CPU interpret parity is covered by pytest; this
validates the compiled kernel's semantics on real TPU hardware."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import numpy as np
import jax
import jax.numpy as jnp

import raycore_tpu as rc
from raycore_tpu.accel.brute import closest_hit_brute
from raycore_tpu.accel.dense import build_dense
from raycore_tpu.ops.pallas_regroup import (closest_hit_packed,
                                            closest_hit_regrouped)

n = int(os.environ.get("PARITY_MESH_N", 224))            # ~100K tris
R = int(os.environ.get("PARITY_RAYS", 65536))
ENGINE = os.environ.get("PARITY_ENGINE", "regroup")      # regroup | packed
PASSES = int(os.environ.get("PARITY_PASSES", 1))   # >=2 = ordered waves
SCENE = os.environ.get("PARITY_SCENE",
                       "blobby" if PASSES >= 2 else "heightfield")
if SCENE == "blobby":
    mesh = rc.blobby_mesh(n_theta=n, n_phi=n)
else:
    mesh = rc.displaced_grid_mesh(n=n, extent=2.0, amplitude=0.35)
if ENGINE == "packed":
    scene = build_dense(mesh, cluster_size=128, sub_chunks=4)
    query = lambda rays: closest_hit_packed(scene, rays, tile=2048)
else:
    scene = build_dense(mesh, cluster_size=128)
    query = lambda rays: closest_hit_regrouped(scene, rays, tile=2048,
                                               passes=PASSES)
print(f"engine={ENGINE} scene={SCENE} passes={PASSES} "
      f"tris={mesh.vertices.shape[0]} K={scene.n_clusters} "
      f"rays={R} mm_precision="
      f"{os.environ.get('RAYCORE_MM_PRECISION', 'highest')}", flush=True)

rng = np.random.default_rng(0)
o = rng.uniform(-1, 1, (R, 3)).astype(np.float32)
o[:, 2] = 2.0
d = rng.normal(size=(R, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
d[:, 2] = -np.abs(d[:, 2]) - 0.2
# Mix in exact axis-parallel rays (the conservativeness regression class).
d[::7] = [0.0, 0.0, -1.0]
rays = rc.Ray.create(o=jnp.asarray(o), d=jnp.asarray(d))

RELAXED = bool(os.environ.get("RAYCORE_MM_PRECISION"))


def check(tag, rays):
    ref = closest_hit_brute(scene.prims, rays, ray_chunk=2048)
    got = query(rays)
    rh, gh = np.asarray(ref.hit), np.asarray(got.hit)
    flips = int(np.sum(rh != gh))
    if RELAXED:
        # Relaxed winner selection (RAYCORE_MM_PRECISION) legitimately
        # flips edge-marginal accept/reject decisions — the mode's
        # documented contract is flip RATE, not exact masks (measured
        # device rate ~1e-4 incoherent, ~4e-4 on lattice-degenerate
        # grids). Report the rate and bound it.
        print(f"{tag}: relaxed-mode hit-mask flips {flips}/{rh.size} "
              f"({flips / rh.size:.2e})", flush=True)
        assert flips / rh.size < 2e-3, f"{tag}: flip rate beyond bound"
    else:
        assert flips == 0, f"{tag}: hit mismatch {flips}"
    both = rh & gh
    rt, gt = np.asarray(ref.t)[both], np.asarray(got.t)[both]
    np.testing.assert_allclose(gt, rt, rtol=2e-5, atol=2e-6)
    pm = (np.asarray(ref.prim_idx)[both] == np.asarray(got.prim_idx)[both])
    dd = (np.abs(gt - rt)[~pm] / np.maximum(rt[~pm], 1e-6)
          if (~pm).any() else 0)
    print(f"{tag}: rays={rh.size} hit-mask-mismatch={flips} "
          f"hits={both.sum()} "
          f"prim-match={pm.mean():.5f} "
          f"max-rel-dt-of-flips={np.max(dd) if (~pm).any() else 0:.2e}",
          flush=True)
    if (~pm).any():
        assert np.max(dd) < 2e-6, f"{tag}: non-tie winner mismatch"
    # Ulp-level t ties legitimately flip a few winners, but the bulk must
    # match exactly. (A systematic identity bug — e.g. the TPU-denormal
    # flush of f32-bitcast int columns — once slipped through as "all
    # ties": every prim differed while every t agreed.)
    assert pm.mean() >= 0.7, f"{tag}: prim agreement {pm.mean():.3f}"


check("incoherent", rays)

side = int(np.sqrt(R))
xs = jnp.linspace(-0.93, 0.93, side, dtype=jnp.float32)
X, Y = jnp.meshgrid(xs, xs, indexing="ij")
oc = jnp.stack([X, Y, jnp.full_like(X, 2.0)], -1).reshape(-1, 3)
dc = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0], jnp.float32), oc.shape)
check("coherent-grid", rc.Ray.create(o=oc, d=dc))

print("TPU parity OK", flush=True)

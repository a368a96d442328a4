"""Candidate-count census for the dense engines (CPU, exact arithmetic).

Candidates/ray is a property of the interval-culling math, not of the
hardware — so the (G, C_eff) design point for the round-3 sweep can be
chosen on CPU while the TPU tunnel is down. For each subgroup size G and
candidate granularity (cluster C=128 vs sub-chunk C_eff=C/SUBC), this
measures on the real headline scene (1M-tri heightfield, 1M Z-order
primary rays):

  - valid (subgroup, candidate) pairs (the regroup/packed engines sweep
    exactly these),
  - candidate triangles tested per ray,
  - packed-sweep step count and a MODELED per-step cost from the
    on-device probe table (tools/probe_matmul_shapes.py, v5e):
      matmul (512,K<=128)@(K,N): HIGHEST ~0.72us at N=128, ~2.3us at
      N=512; DEFAULT(1-pass bf16) ~1/6; DMA ~0.04us per block-spec
      operand; fixed ~0.3us/step.

Usage: JAX_PLATFORMS=cpu python tools/candidate_stats.py [n_tris n_rays]
"""
import os
import sys
import time

# The ambient environment pins JAX_PLATFORMS=axon (tunneled TPU); this
# census is exact arithmetic, so run it on CPU unless told otherwise.
# When the relay is in a SYN-hang state, ANY jax backend init in a
# process where the axon plugin was registered hangs — so re-exec with
# the sitecustomize gate (PALLAS_AXON_POOL_IPS) stripped for CPU runs.
os.environ["JAX_PLATFORMS"] = os.environ.get("RAYCORE_STATS_PLATFORM", "cpu")
if os.environ["JAX_PLATFORMS"] == "cpu" and os.environ.get(
        "PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    del env["PALLAS_AXON_POOL_IPS"]
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import raycore_tpu as rc
from raycore_tpu.accel.dense import build_dense
from raycore_tpu.ops.pallas_instanced import _bundle_entry_vs_bounds
from raycore_tpu.ops.pallas_regroup import subchunk_bounds


def zorder_rays(n_rays):
    side = int(np.sqrt(n_rays))
    xs = np.linspace(-0.95, 0.95, side, dtype=np.float32)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    o = np.stack([X, Y, np.full_like(X, 3.0)], -1)
    ij = np.arange(side, dtype=np.uint64)

    def _spread(v):
        v = (v | (v << 8)) & np.uint64(0x00FF00FF)
        v = (v | (v << 4)) & np.uint64(0x0F0F0F0F)
        v = (v | (v << 2)) & np.uint64(0x33333333)
        v = (v | (v << 1)) & np.uint64(0x55555555)
        return v

    zi = _spread(ij)
    code = (zi[:, None] << np.uint64(1)) | zi[None, :]
    zperm = np.argsort(code.reshape(-1), kind="stable")
    o = o.reshape(-1, 3)[zperm]
    d = np.broadcast_to(np.array([0.0, 0.0, -1.0], np.float32), o.shape)
    return jnp.asarray(o), jnp.asarray(d)


from functools import partial


@partial(jax.jit, static_argnums=(2,))
def _sub_stats(o, d, G):
    from raycore_tpu.core.triangle import safe_invdir
    invd = safe_invdir(jnp.where(d == 0.0, 0.0, d))
    n_sub = o.shape[0] // G
    shp = lambda a: a.reshape((n_sub, G) + a.shape[1:])
    o_t, i_t = shp(o), shp(invd)
    return (jnp.min(o_t, 1), jnp.max(o_t, 1),
            jnp.min(i_t, 1), jnp.max(i_t, 1))


def count_valid(o, d, bmin, bmax, G, chunk=4096):
    """Per-subgroup count of valid candidates vs the (K,3) bounds."""
    olo, ohi, ilo, ihi = _sub_stats(o, d, G)
    n_sub = olo.shape[0]
    tlo = jnp.zeros((n_sub,))
    thi = jnp.full((n_sub,), jnp.inf)

    @jax.jit
    def one_chunk(args, bm, bx):
        olo, ohi, ilo, ihi, tlo, thi = args
        e = _bundle_entry_vs_bounds(
            olo[:, None], ohi[:, None], ilo[:, None], ihi[:, None],
            tlo[:, None], thi[:, None], bm[None], bx[None])
        return jnp.sum(jnp.isfinite(e), axis=1)

    counts = np.zeros((n_sub,), np.int64)
    args = (olo, ohi, ilo, ihi, tlo, thi)
    K = bmin.shape[0]
    for lo in range(0, K, chunk):
        hi = min(K, lo + chunk)
        counts += np.asarray(one_chunk(args, bmin[lo:hi], bmax[lo:hi]),
                             np.int64)
    return counts


def model_step_us(packs, spb_sub, g, n_eff, precision="highest"):
    """Per-grid-step cost model from the v5e probe table."""
    mm = {128: 0.72, 256: 1.3, 512: 2.3}.get(n_eff, 2.3 * n_eff / 512)
    if precision == "bf16":
        mm /= 6.0
    n_dma = packs * spb_sub + packs          # subgroup tbls + feats
    return mm + 0.04 * n_dma + 0.3


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1_048_576
    grid_n = int(np.sqrt(n_tris / 2))
    mesh = rc.displaced_grid_mesh(n=grid_n, extent=2.0, amplitude=0.35)
    print(f"tris={mesh.vertices.shape[0]} rays={n_rays}", flush=True)
    t0 = time.time()
    scene = build_dense(mesh, cluster_size=128, sub_chunks=4)
    jax.block_until_ready(scene.tri_feats)
    print(f"build {time.time() - t0:.1f}s  K={scene.n_clusters} "
          f"C={scene.cluster_size} SUBC={scene.sub_chunks}", flush=True)
    o, d = zorder_rays(n_rays)
    R = o.shape[0]

    sbmin, sbmax = subchunk_bounds(scene)
    rows = []
    for G in (8, 16, 32, 64):
        for gran, bmin, bmax, C_eff in (
                ("cluster", scene.cluster_min, scene.cluster_max, 128),
                ("subchunk", sbmin, sbmax, 32)):
            t0 = time.time()
            counts = count_valid(o, d, bmin, bmax, G)
            pairs = int(counts.sum())
            cand_per_ray = pairs * C_eff * G / R
            # packed sweep shape: ROWS=512 => PACKS*SPB_sub*G=512,
            # PACKS<=8 (K=PACKS*16<=128)
            spb_sub = max(1, 512 // (8 * G))
            packs = 512 // (spb_sub * G)
            steps = -(-pairs // (spb_sub * packs))
            us_hi = model_step_us(packs, spb_sub, G, 4 * C_eff, "highest")
            us_bf = model_step_us(packs, spb_sub, G, 4 * C_eff, "bf16")
            rows.append((G, gran, pairs, cand_per_ray, steps,
                         steps * us_hi / 1e3, steps * us_bf / 1e3))
            print(f"G={G:3d} {gran:8s} pairs={pairs:9d} "
                  f"cand/ray={cand_per_ray:7.1f} steps={steps:7d} "
                  f"sweep_hi={steps * us_hi / 1e3:7.1f}ms "
                  f"sweep_bf16={steps * us_bf / 1e3:7.1f}ms "
                  f"({time.time() - t0:.0f}s)", flush=True)

    print("\nNOTE: sweep times are MODELED from the probe table "
          "(matmul+DMA+fixed); stage1/combine/finalize not included.")


if __name__ == "__main__":
    main()

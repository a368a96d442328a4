"""Two-phase sweep go/no-go census (CPU, exact arithmetic).

Measures on the real headline scene how much exact (HIGHEST) work the
bf16 candidate pass of ops/two_phase.py would leave: the fraction of
rays whose winner identity the intervals cannot certify (these re-run
the exact pipeline), and the fraction of (subgroup, cluster) pairs /
subgroups that contain such a ray (the re-sweep granularity options).

bf16 input rounding is SIMULATED exactly (operands cast f32->bf16->f32,
fp32 accumulation) so the census sees the same q' the TPU DEFAULT
matmul produces, and the same intervals the kernel will use.

Usage: python tools/ambiguity_census.py [n_tris n_rays G]
"""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    del env["PALLAS_AXON_POOL_IPS"]
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import raycore_tpu as rc
from raycore_tpu.accel.dense import build_dense, ray_features
from raycore_tpu.ops.pallas_dense import FEAT
from raycore_tpu.ops.pallas_instanced import _bundle_entry_vs_bounds
from raycore_tpu.ops import two_phase
from raycore_tpu.ops.two_phase import classify
from tools.candidate_stats import zorder_rays, _sub_stats


@partial(jax.jit, static_argnames=("C", "mode"))
def _eval_chunk(phi_g, feats_g, t_min_g, t_max_g, C: int, mode: str):
    """(P, G, FEAT) rays x (P, FEAT, 4C) features -> per-(pair, ray) row
    stats with SIMULATED reduced-precision operand rounding.

    mode="bf16": 1-pass (DEFAULT) — operands cast to bf16.
    mode="bf16x3": 3-pass split-operand scheme — a_h@b_h + a_h@b_l +
      a_l@b_h with a_h = bf16(a), a_l = bf16(a - a_h)."""
    bf = lambda x: x.astype(jnp.bfloat16).astype(jnp.float32)
    mm = lambda a, b: jnp.einsum("pgf,pfc->pgc", a, b,
                                 preferred_element_type=jnp.float32)
    if mode == "bf16":
        q = mm(bf(phi_g), bf(feats_g))
        eps = two_phase.EPS_BF16
    else:
        ah, bh = bf(phi_g), bf(feats_g)
        al, bl = bf(phi_g - ah), bf(feats_g - bh)
        q = mm(ah, bh) + mm(ah, bl) + mm(al, bh)
        eps = two_phase.EPS_BF16X3
    s = mm(bf(jnp.abs(phi_g)), bf(jnp.abs(feats_g)))
    certain, possible, t_lo, t_hi = classify(
        q, s, t_min_g[..., None], t_max_g[..., None], C, eps=eps)
    lanes = jnp.arange(C, dtype=jnp.int32)
    hi = jnp.where(certain, t_hi, jnp.inf)
    hi_min = jnp.min(hi, -1)
    hi_lane = jnp.argmin(hi, -1).astype(jnp.int32)
    lo = jnp.where(possible, jnp.maximum(t_lo, 0.0), jnp.inf)
    lo_min = jnp.min(lo, -1)
    lo_lane = jnp.argmin(lo, -1).astype(jnp.int32)
    lo_excl = jnp.where(lanes[None, None] == lo_lane[..., None], jnp.inf, lo)
    lo_second = jnp.min(lo_excl, -1)
    return hi_min, hi_lane, lo_min, lo_lane, lo_second


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 262_144
    G = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    mode = sys.argv[4] if len(sys.argv) > 4 else "bf16x3"
    grid_n = int(np.sqrt(n_tris / 2))
    mesh = rc.displaced_grid_mesh(n=grid_n, extent=2.0, amplitude=0.35)
    scene = build_dense(mesh, cluster_size=128)
    C, K = scene.cluster_size, scene.n_clusters
    o, d = zorder_rays(n_rays)
    R = o.shape[0]
    n_sub = R // G
    print(f"tris={mesh.vertices.shape[0]} rays={R} G={G} K={K} mode={mode}", flush=True)

    # Valid (subgroup, cluster) pairs — same conservative culling as the
    # engines' refine stage.
    olo, ohi, ilo, ihi = _sub_stats(o, d, G)
    tlo = jnp.zeros((n_sub, 1))
    thi = jnp.full((n_sub, 1), jnp.inf)
    valid = np.zeros((n_sub, K), bool)
    CH = 2048
    for lo_k in range(0, K, CH):
        hi_k = min(K, lo_k + CH)
        e = _bundle_entry_vs_bounds(
            olo[:, None], ohi[:, None], ilo[:, None], ihi[:, None],
            tlo, thi, scene.cluster_min[None, lo_k:hi_k],
            scene.cluster_max[None, lo_k:hi_k])
        valid[:, lo_k:hi_k] = np.isfinite(np.asarray(e))
    sub_ids, cids = np.nonzero(valid)
    P = sub_ids.shape[0]
    print(f"pairs={P} cand/ray={P * C / n_sub:.1f}", flush=True)

    phi = np.asarray(ray_features(o, d)).reshape(n_sub, G, FEAT)
    feats = np.asarray(scene.tri_feats)
    t_min = np.zeros((n_sub, G), np.float32)
    t_max = np.full((n_sub, G), np.inf, np.float32)

    rows = []
    t0 = time.time()
    CHP = 4096
    for lo_p in range(0, P, CHP):
        hi_p = min(P, lo_p + CHP)
        si, ci = sub_ids[lo_p:hi_p], cids[lo_p:hi_p]
        out = _eval_chunk(jnp.asarray(phi[si]), jnp.asarray(feats[ci]),
                          jnp.asarray(t_min[si]), jnp.asarray(t_max[si]), C, mode)
        rows.append([np.asarray(x) for x in out])
    hi_min, hi_lane, lo_min, lo_lane, lo_second = (
        np.concatenate([r[i] for r in rows]) for i in range(5))
    print(f"eval {time.time() - t0:.0f}s", flush=True)

    # Per-ray merge (numpy): rows are (pair, G).
    ray_of = (sub_ids[:, None] * G + np.arange(G)[None, :])     # (P, G)
    cand_hi = cids[:, None] * C + hi_lane                        # global ids
    cand_lo = cids[:, None] * C + lo_lane
    flat = lambda a: a.reshape(-1)
    order = np.argsort(flat(ray_of), kind="stable")
    rid = flat(ray_of)[order]
    f_hi, f_hl = flat(hi_min)[order], flat(cand_hi)[order]
    f_lo, f_ll = flat(lo_min)[order], flat(cand_lo)[order]
    f_l2 = flat(lo_second)[order]
    starts = np.searchsorted(rid, np.arange(R))
    ends = np.searchsorted(rid, np.arange(R) + 1)

    # Per-ray reductions via ufunc.reduceat: segments tile the sorted row
    # array, so reduceat over `starts` reduces [starts[i]:starts[i+1]] ==
    # [starts[i]:ends[i]]; empty segments (a ray with no candidate rows)
    # return a neighbor's value and are masked via `ne`.
    ub = np.full(R, np.inf, np.float32)
    winner = np.full(R, -1, np.int64)
    amb = np.zeros(R, bool)
    ne = starts < ends
    if len(f_hi):
        mins = np.minimum.reduceat(f_hi, np.clip(starts, 0, len(f_hi) - 1))
        ub = np.where(ne, mins[:R], np.inf).astype(np.float32)
        # winner: first row whose hi_min equals ub (scan via argmin trick)
        # do it per-ray with a loop-free trick: mark rows equal to their
        # ray's ub, take the first.
        row_ub = ub[rid]
        is_win = (f_hi == row_ub) & np.isfinite(row_ub)
        first_win = np.full(R, -1, np.int64)
        w_rows = np.nonzero(is_win)[0]
        # keep the FIRST winning row per ray
        fw_ray = rid[w_rows]
        keep = np.ones(len(w_rows), bool)
        keep[1:] = fw_ray[1:] != fw_ray[:-1]
        first_win[fw_ray[keep]] = w_rows[keep]
        has_c = first_win >= 0
        winner[has_c] = f_hl[first_win[has_c]]

        # threat per row: min possible t_lo excluding the winner candidate
        row_winner = np.where(rid >= 0, winner[rid], -1)
        thr = np.where(f_ll == row_winner, f_l2, f_lo)
        thr_min = np.minimum.reduceat(thr, np.clip(starts, 0, len(thr) - 1))
        thr_ray = np.where(ne, thr_min[:R], np.inf)
        amb = np.where(has_c, thr_ray < ub, np.isfinite(thr_ray))

    amb_frac = amb.mean()
    # pair/subgroup pull rates
    amb_row = amb[flat(ray_of)].reshape(P, G).any(1)
    pair_pull = amb_row.mean()
    sub_pull = np.zeros(n_sub, bool)
    np.logical_or.at(sub_pull, sub_ids, amb_row)
    print(f"ambiguous rays: {amb_frac * 100:.2f}%   "
          f"pairs pulled: {pair_pull * 100:.2f}%   "
          f"subgroups pulled: {sub_pull.mean() * 100:.2f}%", flush=True)
    cert_hit = (winner >= 0) & ~amb
    print(f"certain-winner rays: {cert_hit.mean() * 100:.2f}%   "
          f"certain-miss rays: {((winner < 0) & ~amb).mean() * 100:.2f}%",
          flush=True)


if __name__ == "__main__":
    main()

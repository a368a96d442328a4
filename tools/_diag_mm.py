import sys; sys.path.insert(0, '/root/repo')
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
import jax, jax.numpy as jnp, numpy as np
import raycore_tpu as rc
from raycore_tpu.scene.tlas import TLAS
from raycore_tpu.scene.bake import bake_dense
from raycore_tpu.accel import dispatch as disp

mgr = TLAS()
mgr.push(rc.sphere_mesh(radius=1.0, n_theta=24, n_phi=48), None)
tr = np.eye(3, 4, dtype=np.float32); tr[0, 3] = 3.0
mgr.push(rc.box_mesh(), tr)
tlas = mgr.sync(); ds = bake_dense(mgr, cluster_size=128)
side = 256
xs = jnp.linspace(-1.8, 4.2, side, dtype=jnp.float32)
X, Y = jnp.meshgrid(xs, jnp.linspace(-1.5, 1.5, side), indexing="ij")
o = jnp.stack([X, Y, jnp.full_like(X, -4.0)], -1).reshape(-1, 3)
d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), o.shape)
rays = rc.Ray.create(o=o, d=d)
rt = rc.closest_hit(tlas, rays, tile_size=4096)
rd = disp.scene_closest_hit(ds, rays)
ht, hd = np.asarray(rt.hit), np.asarray(rd.hit)
mm = ht != hd
idx = np.where(mm)[0]
print("mismatches:", len(idx), flush=True)
pad = 128 - len(idx) % 128
oi = np.concatenate([np.asarray(o)[idx], np.tile(np.asarray(o)[idx[:1]], (pad,1))])
di = np.concatenate([np.asarray(d)[idx], np.tile(np.asarray(d)[idx[:1]], (pad,1))])
sub = rc.Ray.create(o=jnp.asarray(oi), d=jnp.asarray(di))
rb = rc.closest_hit_brute(ds.prims, sub)
hb = np.asarray(rb.hit)[:len(idx)]
print("  dense==brute:", (hd[idx] == hb).sum(), "/", len(idx), flush=True)
print("  tlas ==brute:", (ht[idx] == hb).sum(), "/", len(idx), flush=True)
bb = np.asarray(rb.barycentric)[:len(idx)]
print("  brute bary min comp:", np.round(np.sort(bb.min(-1))[:12], 6), flush=True)
print("  who hits: tlas", ht[idx].sum(), "dense", hd[idx].sum(), "brute", hb.sum(), flush=True)

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""One consolidated TPU perf experiment: claim warmup, gather-XLA variants,
adaptive-pass components, and the Pallas node backend (compile check at a
small shape first, then bench-shape timing).  Run as ONE process — the axon
relay serializes TPU claimants."""
import time
import jax, jax.numpy as jnp, numpy as np

def log(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

from bemstokes_tpu.mesh import read_mesh, build_scalar_space
from bemstokes_tpu.mesh.refine import refine_uniform, SphericalManifold
from bemstokes_tpu.fem.geometry import euler_from_mesh, support_points
from bemstokes_tpu.ops import AssemblyConfig, build_assembly_tables, assemble_V_K

def setup(refine):
    mesh = refine_uniform(
        read_mesh('/root/reference/tests/grid_test/sphere_translation_0.msh', dim=3),
        SphericalManifold(), times=refine)
    space = build_scalar_space(mesh, 1)
    e = jnp.asarray(euler_from_mesh(mesh.vertices, space), jnp.float32)
    return space, e, support_points(e, space, space)

def timeit(name, fn, *args, pairs=None):
    f = jax.jit(fn)
    try:
        t0 = time.perf_counter()
        out = f(*args); np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        t1 = time.perf_counter()
        ts = []
        for _ in range(3):
            ta = time.perf_counter()
            out = f(*args); np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            ts.append(time.perf_counter() - ta)
        extra = f" -> {pairs/min(ts):.3e} pairs/s" if pairs else ""
        log(f"{name}: compile+1st {t1-t0:.1f}s run {min(ts)*1e3:.1f} ms{extra}")
        return out
    except Exception as ex:
        log(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:300]}")
        return None

# ---- claim warmup ----
x = jnp.ones((256, 256), jnp.float32)
timeit("warmup-matmul", lambda a: a @ a, x)

# ---- pallas-node compile check, small shape ----
space_s, e_s, sp_s = setup(1)
def tb(space, **kw):
    return build_assembly_tables(space, space, AssemblyConfig(
        quad_order=4, row_tile=256, cell_chunk=512, dtype=jnp.float32, **kw))
t_small = tb(space_s, column_mode='node', backend='pallas')
out_p = timeit("pallas-node-small", lambda e, s: assemble_V_K(e, s, t_small), e_s, sp_s)
t_small_x = tb(space_s)
out_x = timeit("gather-xla-small", lambda e, s: assemble_V_K(e, s, t_small_x), e_s, sp_s)
if out_p is not None and out_x is not None:
    log(f"pallas vs xla maxdiff: V {float(jnp.abs(out_p[0]-out_x[0]).max()):.2e} "
        f"K {float(jnp.abs(out_p[1]-out_x[1]).max()):.2e}")

# ---- bench shape ----
space, e, sp = setup(3)
n, Nc = space.n_nodes, space.mesh.n_cells
pairs = float(n) * Nc
log(f"bench mesh {n} nodes {Nc} cells")

if out_p is not None:
    timeit("pallas-node-o4", lambda x1, x2, t=tb(space, column_mode='node', backend='pallas'): assemble_V_K(x1, x2, t), e, sp, pairs=pairs)
    timeit("pallas-node-adaptive", lambda x1, x2, t=tb(space, column_mode='node', backend='pallas', quad_order_far=2, near_panels=64): assemble_V_K(x1, x2, t), e, sp, pairs=pairs)

import bemstokes_tpu.ops.assemble as asm
t4 = tb(space)
t2 = tb(space, quad_order_far=2, near_panels=64)
timeit("xla-gather-o4", lambda x1, x2: assemble_V_K(x1, x2, t4), e, sp, pairs=pairs)
orig = asm._add_near_corrections
asm._add_near_corrections = lambda V, K, *a, **k: (V, K)
timeit("xla-gather-o2-nocorr", lambda x1, x2: assemble_V_K(x1, x2, t2), e, sp, pairs=pairs)
asm._add_near_corrections = orig
timeit("xla-gather-adaptive", lambda x1, x2: assemble_V_K(x1, x2, t2), e, sp, pairs=pairs)

def topk(ee, ss):
    centers = ee[jnp.asarray(t2.cells_nodes_map)].mean(axis=1)
    d2 = jnp.sum((ss[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    return jax.lax.top_k(-d2, 64)[1]
timeit("topk-alone", topk, e, sp)
log("done")

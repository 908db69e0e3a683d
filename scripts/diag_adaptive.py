import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Time assembly components at the bench shape on TPU."""
import time, sys, os
import jax, jax.numpy as jnp, numpy as np

def log(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)
from bemstokes_tpu.mesh import read_mesh, build_scalar_space
from bemstokes_tpu.mesh.refine import refine_uniform, SphericalManifold
from bemstokes_tpu.fem.geometry import euler_from_mesh, support_points
from bemstokes_tpu.ops import AssemblyConfig, build_assembly_tables, assemble_V_K
import bemstokes_tpu.ops.assemble as asm

mesh = refine_uniform(read_mesh('/root/reference/tests/grid_test/sphere_translation_0.msh', dim=3), SphericalManifold(), times=3)
space = build_scalar_space(mesh, 1)
n, Nc = space.n_nodes, mesh.n_cells
log(f"mesh {n} {Nc}")
euler32 = jnp.asarray(euler_from_mesh(mesh.vertices, space), jnp.float32)
sp = support_points(euler32, space, space)

def timeit(name, fn, *args):
    f = jax.jit(fn)
    t0=time.perf_counter(); out = f(*args); leaf = jax.tree_util.tree_leaves(out)[0]; np.asarray(leaf.ravel()[0])
    t1=time.perf_counter()
    out = f(*args); leaf = jax.tree_util.tree_leaves(out)[0]; np.asarray(leaf.ravel()[0])
    t2=time.perf_counter()
    out = f(*args); leaf = jax.tree_util.tree_leaves(out)[0]; np.asarray(leaf.ravel()[0])
    t3=time.perf_counter()
    log(f"{name}: compile+1st {t1-t0:.1f}s run {min(t2-t1,t3-t2)*1e3:.1f} ms")

def tables_for(**kw):
    return build_assembly_tables(space, space, AssemblyConfig(quad_order=4, row_tile=256, cell_chunk=512, dtype=jnp.float32, **kw))

t4 = tables_for()
t2 = tables_for(quad_order_far=2, near_panels=64)
orig = asm._add_near_corrections
# dense-only at order 4
timeit("dense-o4+sing", lambda e, s: assemble_V_K(e, s, t4), euler32, sp)
# dense-only at order 2 (adaptive tables, correction disabled)
asm._add_near_corrections = lambda V,K,*a,**k: (V,K)
timeit("dense-o2+sing", lambda e, s: assemble_V_K(e, s, t2), euler32, sp)
asm._add_near_corrections = orig
# full adaptive
timeit("adaptive-full", lambda e, s: assemble_V_K(e, s, t2), euler32, sp)
# top_k alone
def topk(e, s):
    centers = e[jnp.asarray(t2.cells_nodes_map)].mean(axis=1)
    d2 = jnp.sum((s[:, None, :] - centers[None, :, :])**2, axis=-1)
    return jax.lax.top_k(-d2, 64)[1]
timeit("topk-alone", topk, euler32, sp)

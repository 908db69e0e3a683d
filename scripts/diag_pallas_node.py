import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
def log(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)
from bemstokes_tpu.mesh import read_mesh, build_scalar_space
from bemstokes_tpu.mesh.refine import refine_uniform, SphericalManifold
from bemstokes_tpu.fem.geometry import euler_from_mesh, support_points
from bemstokes_tpu.ops import AssemblyConfig, build_assembly_tables, assemble_V_K
mesh = refine_uniform(read_mesh('/root/reference/tests/grid_test/sphere_translation_0.msh', dim=3), SphericalManifold(), times=3)
space = build_scalar_space(mesh, 1)
n, Nc = space.n_nodes, mesh.n_cells
log(f"mesh {n} {Nc}")
euler = jnp.asarray(euler_from_mesh(mesh.vertices, space), jnp.float32)
sp = support_points(euler, space, space)
def timeit(name, fn, *args):
    f = jax.jit(fn)
    t0=time.perf_counter(); out=f(*args); np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0]); t1=time.perf_counter()
    ts=[]
    for _ in range(3):
        ta=time.perf_counter(); out=f(*args); np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0]); ts.append(time.perf_counter()-ta)
    log(f"{name}: compile+1st {t1-t0:.1f}s run {min(ts)*1e3:.1f} ms -> {n*Nc/min(ts):.3e} pairs/s")
    return out
def tb(**kw):
    return build_assembly_tables(space, space, AssemblyConfig(quad_order=4, dtype=jnp.float32, **kw))
out1 = timeit("pallas-node o4", lambda e, s, t=tb(column_mode='node', backend='pallas'): assemble_V_K(e, s, t), euler, sp)
out2 = timeit("pallas-node adaptive f2 K32", lambda e, s, t=tb(column_mode='node', backend='pallas', quad_order_far=2, near_panels=32): assemble_V_K(e, s, t), euler, sp)
out3 = timeit("gather-jax o4 (baseline)", lambda e, s, t=tb(column_mode='gather', row_tile=256, cell_chunk=512): assemble_V_K(e, s, t), euler, sp)
V1, V3 = out1[0], out3[0]
print('maxdiff pallas vs gather:', float(jnp.abs(V1-V3).max()), flush=True)

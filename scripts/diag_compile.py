import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Diagnose XLA-TPU compile time of the assembly pipeline, piecewise."""
import time, sys, os
import jax
import jax.numpy as jnp
import numpy as np

REFINE = int(os.environ.get("DIAG_REFINE", "2"))
ROW_TILE = int(os.environ.get("DIAG_ROW_TILE", "256"))
CELL_CHUNK = int(os.environ.get("DIAG_CELL_CHUNK", "512"))

def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

log(f"devices: {jax.devices()}")
from bemstokes_tpu.mesh import read_mesh, build_scalar_space
from bemstokes_tpu.mesh.refine import refine_uniform, SphericalManifold
from bemstokes_tpu.fem.geometry import euler_from_mesh, support_points
from bemstokes_tpu.ops import AssemblyConfig, build_assembly_tables, assemble_V_K
from bemstokes_tpu.ops.assemble import assemble_rows, _add_singular_rows

mesh = read_mesh('/root/reference/tests/grid_test/sphere_translation_0.msh', dim=3)
mesh = refine_uniform(mesh, SphericalManifold(), times=REFINE)
space = build_scalar_space(mesh, 1)
n, Nc = space.n_nodes, mesh.n_cells
log(f"mesh {n} nodes {Nc} cells, row_tile={ROW_TILE} cell_chunk={CELL_CHUNK}")
acfg = AssemblyConfig(quad_order=4, row_tile=min(ROW_TILE,n), cell_chunk=min(CELL_CHUNK,Nc), dtype=jnp.float32)
tables = build_assembly_tables(space, space, acfg)
euler = jnp.asarray(euler_from_mesh(mesh.vertices, space), jnp.float32)
sp = support_points(euler, space, space)

def timeit(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.perf_counter(); lo = f.lower(*args); t1 = time.perf_counter()
    comp = lo.compile(); t2 = time.perf_counter()
    out = comp(*args); leaf = jax.tree_util.tree_leaves(out)[0]; np.asarray(leaf.ravel()[0])
    t3 = time.perf_counter()
    out = comp(*args); leaf = jax.tree_util.tree_leaves(out)[0]; np.asarray(leaf.ravel()[0])
    t4 = time.perf_counter()
    log(f"{name}: lower {t1-t0:.1f}s compile {t2-t1:.1f}s run1 {t3-t2:.2f}s run2 {t4-t3:.3f}s")
    return out

# 0. relay baseline: trivial kernel
timeit("trivial-matmul", lambda e, s: (e.T @ e), euler, sp)

# 1. smooth path only (no singular): assemble_rows without singular add
import bemstokes_tpu.ops.assemble as asm
orig_sing = asm._add_singular_rows
asm._add_singular_rows = lambda V, K, *a, **k: (V, K)
timeit("smooth-only", lambda e, s: assemble_V_K(e, s, tables), euler, sp)
asm._add_singular_rows = orig_sing

# 2. singular path only
zero = jnp.zeros((3*n, 3*n), jnp.float32)
timeit("singular-only", lambda e, s: orig_sing(zero, zero, e, s, tables, 0, n), euler, sp)

# 3. full
timeit("full", lambda e, s: assemble_V_K(e, s, tables), euler, sp)

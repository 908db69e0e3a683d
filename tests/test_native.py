"""Native mesh-core parity tests: the C++ parsers/table builders must agree
exactly with the numpy fallbacks (native/meshcore.cpp vs mesh/io.py,
ops/assemble.py)."""

import numpy as np
import pytest

from bemstokes_tpu._native import (
    get_lib,
    read_mesh_native,
    incidence_native,
    weld_native,
)
from bemstokes_tpu.mesh.io import read_msh, read_inp

MSH = "/root/reference/tests/grid_test/sphere_translation_0.msh"
INP = "/root/reference/debug_grids/circle_0.inp"

needs_native = pytest.mark.skipif(
    get_lib() is None, reason="native meshcore not buildable here"
)


@needs_native
def test_native_msh_matches_python():
    v, c, m = read_mesh_native(MSH, 3, "msh")
    ref = read_msh(MSH, 3)
    assert np.array_equal(v, ref.vertices)
    assert np.array_equal(c, ref.cells)
    assert np.array_equal(m, ref.material_id)


@needs_native
def test_native_inp_matches_python_2d():
    v, c, m = read_mesh_native(INP, 2, "inp")
    ref = read_inp(INP, 2)
    assert np.array_equal(v, ref.vertices)
    assert np.array_equal(c, ref.cells)
    assert np.array_equal(m, ref.material_id)


@needs_native
def test_native_incidence_matches_numpy():
    rng = np.random.default_rng(0)
    cells = rng.integers(0, 50, size=(120, 4)).astype(np.int32)
    n = 50
    slots, mask = incidence_native(cells, n)
    # numpy reference
    flat = cells.reshape(-1).astype(np.int64)
    counts = np.bincount(flat, minlength=n)
    vmax = counts.max()
    ref_slots = np.zeros((n, vmax), np.int32)
    ref_mask = np.zeros((n, vmax))
    fill = np.zeros(n, np.int64)
    for s, j in enumerate(flat):
        ref_slots[j, fill[j]] = s
        ref_mask[j, fill[j]] = 1.0
        fill[j] += 1
    assert slots.shape == ref_slots.shape
    assert np.array_equal(slots, ref_slots)
    assert np.array_equal(mask, ref_mask)


@needs_native
def test_native_weld():
    verts = np.array(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 0.0], [1.0, 0.0, 1e-15]]
    )
    remap, n_unique = weld_native(verts, 1e-12)
    assert n_unique == 2
    assert remap[0] == remap[2]
    assert remap[1] == remap[3]
    assert remap[0] != remap[1]

"""Structured raster quad fast path (shift-based EVP kernels) must
match the gather path (mesh/structured.py + variational_fast.py S-kernels)."""

import numpy as np
import jax.numpy as jnp

from seaice_tpu.config import box_test_config
from seaice_tpu.mesh.structured import detect_raster_quad, raster_reorder
from seaice_tpu.model import SeaIceModel
from seaice_tpu.testcases import box


def test_detect_and_reorder():
    mesh = box.box_test_mesh(7, 5)
    assert detect_raster_quad(mesh) is None      # vertices not raster
    rm = raster_reorder(mesh)
    lay = detect_raster_quad(rm)
    assert lay is not None
    assert (lay.nxc, lay.nyc) == (7, 5)
    assert (lay.nxv, lay.nyv) == (8, 6)
    assert set(lay.offsets) == {(0, 0), (1, 0), (1, 1), (0, 1)}
    # hex meshes are not raster quads
    assert detect_raster_quad(box.box_test_mesh(6, 6, hex_mesh=True)) \
        is None


def test_structured_matches_gather_path():
    """Full EVP step on the reordered mesh (structured path) must match
    the gather path on the same mesh to f32-roundoff-class tolerance
    (summation order differs at vertices)."""
    cfg = box_test_config(elastic_subcycles=12)
    mesh = raster_reorder(box.box_test_mesh(10, 10))
    mesh.f_vertex = box.box_coriolis_parameter(mesh)
    assert detect_raster_quad(mesh) is not None
    area, vol, snow = box.box_initial_state(mesh, 1)
    forcing = box.box_forcing(mesh, t=0.0)

    import seaice_tpu.dynamics.evp as evp
    from seaice_tpu.mesh import structured as st

    model = SeaIceModel(mesh, cfg, dtype=jnp.float64)
    state = model.init_state(area, vol, snow)
    out_s, diags_s = model.make_step()(model.tensors, state, forcing)

    # force the gather path by disabling detection
    orig = st.detect_raster_quad
    st.detect_raster_quad = lambda m: None
    try:
        model_g = SeaIceModel(mesh, cfg, dtype=jnp.float64)
        state_g = model_g.init_state(area, vol, snow)
        out_g, diags_g = model_g.make_step()(model_g.tensors, state_g,
                                             forcing)
    finally:
        st.detect_raster_quad = orig

    np.testing.assert_allclose(
        np.asarray(out_s.velocity.u_velocity),
        np.asarray(out_g.velocity.u_velocity), atol=1e-12, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(out_s.velocity.v_velocity),
        np.asarray(out_g.velocity.v_velocity), atol=1e-12, rtol=1e-10)
    for f in ("stress11", "stress12"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_s.velocity, f)),
            np.asarray(getattr(out_g.velocity, f)),
            atol=1e-8, rtol=1e-8, err_msg=f)


def test_reordered_trajectory_matches_original_order():
    """raster_reorder is a pure permutation: the trajectory on the
    reordered mesh, permuted back, equals the original trajectory."""
    cfg = box_test_config(elastic_subcycles=8)
    mesh0 = box.box_test_mesh(8, 8)
    mesh0.f_vertex = box.box_coriolis_parameter(mesh0)
    mesh1 = raster_reorder(box.box_test_mesh(8, 8))
    mesh1.f_vertex = box.box_coriolis_parameter(mesh1)

    # vertex permutation: match by coordinates
    key0 = np.round(np.stack([mesh0.x_vertex, mesh0.y_vertex], 1), 3)
    key1 = np.round(np.stack([mesh1.x_vertex, mesh1.y_vertex], 1), 3)
    d0 = {tuple(k): i for i, k in enumerate(key0)}
    perm = np.array([d0[tuple(k)] for k in key1])   # old idx per new

    import seaice_tpu.mesh.structured as st
    outs = {}
    for name, mesh in (("orig", mesh0), ("raster", mesh1)):
        model = SeaIceModel(mesh, cfg, dtype=jnp.float64)
        area, vol, snow = box.box_initial_state(mesh, 1)
        state = model.init_state(area, vol, snow)
        forcing = box.box_forcing(mesh, t=0.0)
        out, _ = model.make_step()(model.tensors, state, forcing)
        outs[name] = np.asarray(out.velocity.u_velocity)
    np.testing.assert_allclose(outs["raster"], outs["orig"][perm],
                               atol=1e-11, rtol=1e-9)

"""Departure-statistics monitor: per-variable and per-report-type tables
(reference: monit_dep/monit_print common_obs_scale.f90:1851,1899;
monit_obs_mpi per-type breakdown common_mpi_scale.f90:1481-1633)."""

import numpy as np

from scale_letkf_tpu.da.monitor import (
    monit_dep, monit_dep_bytype)
from scale_letkf_tpu.obs.types import (
    ID_U, ID_T, ID_RADAR_REF, ID_RADAR_VR, TYP_PHARAD, QC_GOOD,
    QC_GROSS_ERR, OBTYPE_NAMES)


def _mixed_obs():
    elem = np.asarray([ID_U, ID_T, ID_T, ID_RADAR_REF, ID_RADAR_VR,
                       ID_RADAR_REF], np.int32)
    typ = np.asarray([0, 0, 1, TYP_PHARAD, TYP_PHARAD, TYP_PHARAD],
                     np.int32)
    dep = np.asarray([1.0, -1.0, 2.0, 3.0, -3.0, 5.0])
    qc = np.asarray([QC_GOOD, QC_GOOD, QC_GOOD, QC_GOOD, QC_GOOD,
                     QC_GROSS_ERR], np.int32)
    return elem, typ, dep, qc


def test_monit_dep_groups_and_qc():
    elem, typ, dep, qc = _mixed_obs()
    st = monit_dep(elem, dep, qc)
    assert st.nobs["U"] == 1 and st.nobs["T"] == 2
    assert st.nobs["REF"] == 1          # the gross-error REF is excluded
    np.testing.assert_allclose(st.rmse["T"], np.sqrt((1 + 4) / 2))


def test_monit_dep_bytype_breakdown():
    elem, typ, dep, qc = _mixed_obs()
    ts = monit_dep_bytype(elem, typ, dep, qc)
    assert set(ts.rows) == {OBTYPE_NAMES[0], OBTYPE_NAMES[1],
                            OBTYPE_NAMES[TYP_PHARAD]}
    adpupa = ts.rows[OBTYPE_NAMES[0]]
    assert adpupa.nobs["U"] == 1 and adpupa.nobs["T"] == 1
    np.testing.assert_allclose(adpupa.rmse["T"], 1.0)   # only dep=-1
    rad = ts.rows[OBTYPE_NAMES[TYP_PHARAD]]
    assert rad.nobs["REF"] == 1 and rad.nobs["Vr"] == 1
    np.testing.assert_allclose(rad.bias["REF"], 3.0)
    # the table formats with per-type sections
    txt = ts.format("O-B")
    assert OBTYPE_NAMES[TYP_PHARAD] in txt and "RMSE" in txt
    assert txt.count("--") == 3         # one section per report type


def test_analysis_info_carries_bytype_tables():
    """driver.analysis returns the per-type tables for the CLI printer."""
    import jax.numpy as jnp
    from tests.test_analysis_sharded import make_case
    from scale_letkf_tpu.cycle import CycleDriver
    from scale_letkf_tpu.model.dycore import DycoreConfig, from_collocated
    from scale_letkf_tpu.state import state_trans_inv
    import jax

    grid, gues, ctx, cfg, z_full = make_case(K=4, NZ=3, NY=8, NX=8,
                                             nobs=20)
    # reconstruct a prognostic ensemble from the analysis variables
    ens = jax.vmap(from_collocated)(state_trans_inv(gues))
    from scale_letkf_tpu.model.ideal import balanced_state
    _, rho_ref, p_ref = balanced_state(3, 8, 8, 500.0)
    dycfg = DycoreConfig(dx=2e3, dy=2e3, dz=500.0, dt=1.0, ztop=1500.0)
    driver = CycleDriver(grid, cfg, dycfg, rho_ref, p_ref)

    from scale_letkf_tpu.obs.types import Observations
    # rebuild an Observations object matching the context arrays
    obs = Observations(
        elem=ctx.elem, lon=np.zeros(ctx.nobs), lat=np.zeros(ctx.nobs),
        lev=np.full(ctx.nobs, 850e2), dat=np.asarray(ctx.dat),
        err=np.asarray(ctx.err), typ=ctx.typ, dif=np.zeros(ctx.nobs))
    lon, lat = grid.ij_to_lonlat(
        np.full(ctx.nobs, 4.0), np.full(ctx.nobs, 4.0))
    obs.lon = np.asarray(lon)
    obs.lat = np.asarray(lat)
    _, info = driver.analysis(ens, obs)
    assert "stats_gues_bytype" in info and "stats_anal_bytype" in info
    assert info["stats_gues_bytype"].rows

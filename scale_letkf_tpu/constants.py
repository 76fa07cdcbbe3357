"""Physical constants shared across the framework.

Values mirror the reference constant set (reference: common/common.f90:28-40 and
the SCALE constant module conventions used by common_scale.f90 state_trans),
so that thermodynamic transforms and observation operators agree numerically
with the reference system.
"""

from __future__ import annotations

import numpy as np

# Earth / geometry
RE = 6.371e6          # earth radius [m]            (common/common.f90: re)
GRAV = 9.81           # gravity [m/s^2]             (common/common.f90: gg)
D2R = np.pi / 180.0
R2D = 180.0 / np.pi

# Dry air / vapor thermodynamics (SCALE CONST module conventions)
RD = 287.04           # gas constant dry air [J/kg/K]     (CONST_Rdry)
RV = 461.50           # gas constant water vapor [J/kg/K] (CONST_Rvap)
CVDRY = 717.60        # specific heat dry air, const volume [J/kg/K] (CONST_CVdry)
CPDRY = RD + CVDRY    # specific heat dry air, const pressure
PRE00 = 1.0e5         # reference pressure [Pa]           (CONST_PRE00)
T00 = 273.15

# Water category specific heats (const volume) used in moist thermodynamics,
# matching SCALE tracer TRACER_CV for the Tomita08 6-category set
# (qv, qc, qr, qi, qs, qg). Vapour uses CV_vapor; liquid water CL; ice CI.
CV_VAPOR = 1390.0     # CONST_CVvap
CL_WATER = 4218.0     # CONST_CL (liquid water specific heat)
CI_ICE = 2106.0       # CONST_CI (ice specific heat)

# TRACER_CV for [qv, qc, qr, qi, qs, qg] (reference: scale_tracer TRACER_CV
# consumed in common_scale.f90:1181 state_trans moist CVtot sum)
TRACER_CV = np.array([CV_VAPOR, CL_WATER, CL_WATER, CI_ICE, CI_ICE, CI_ICE])

# Virtual temperature factor (common/common.f90: fvirt)
FVIRT = RV / RD - 1.0

# Saturation vapor pressure (Tetens) constants
PSAT0 = 610.78        # [Pa] at T0
TETENS_A_LIQ = 17.269
TETENS_B_LIQ = 35.86
TETENS_A_ICE = 21.875
TETENS_B_ICE = 7.66

UNDEF = -9.99e33      # undefined value sentinel (common/common.f90 undef convention)

"""Independent NumPy oracle for the LETKF transform (Hunt et al. 2007).

Straightforward per-point float64 implementation of the published ETKF
equations, used only as the test oracle for scale_letkf_tpu.ops.letkf_core.
Semantics follow the reference algorithm (common/common_letkf.f90:52-257):
the same weighting, inflation shift, eigendecomposition-based inverse/sqrt,
zero-obs identity branch, and Miyoshi-2011 adaptive inflation update.
"""

from __future__ import annotations

import numpy as np

SIGMA_B = 0.04


def letkf_core_np(hdxb, rdiag, rloc, dep, parm_infl, *, nobsl=None,
                  infl_update=False, depd=None):
    """One local analysis. hdxb: (L, K); rdiag/rloc/dep: (L,); scalar infl.

    Returns dict with trans (K,K), transm (K,), pao (K,K), infl, transmd.
    Only the first `nobsl` obs rows are used (default: all rows).
    """
    hdxb = np.asarray(hdxb, np.float64)
    L, K = hdxb.shape
    n = L if nobsl is None else nobsl
    rdiag = np.asarray(rdiag, np.float64)[:n]
    rloc = np.asarray(rloc, np.float64)[:n]
    dep = np.asarray(dep, np.float64)[:n]
    hdxb = hdxb[:n]

    out = {}
    if n == 0:
        out["trans"] = np.sqrt(parm_infl) * np.eye(K)
        out["transm"] = np.zeros(K)
        out["transmd"] = np.zeros(K)
        out["pao"] = parm_infl / (K - 1) * np.eye(K)
        out["infl"] = parm_infl
        return out

    # C = (HδX)^T R^-1 (HδX) with R-localization folded into R^-1
    a = hdxb * (rloc / rdiag)[:, None]          # R^-1-weighted perturbations
    c = a.T @ hdxb
    c[np.diag_indices(K)] += (K - 1) / parm_infl

    lam, v = np.linalg.eigh(c)
    pao = (v / lam) @ v.T
    gain = pao @ a.T                            # Pa (HδX)^T R^-1, (K, n)
    transm = gain @ dep
    out["transmd"] = gain @ np.asarray(depd, np.float64)[:n] if depd is not None \
        else np.zeros(K)
    trans = (v * np.sqrt((K - 1) / lam)) @ v.T

    out["trans"] = trans
    out["transm"] = transm
    out["pao"] = pao

    if infl_update:
        p1 = float(np.sum(dep * dep / rdiag * rloc))
        p2 = float(np.sum(a * hdxb)) / (K - 1)
        p3 = float(np.sum(rloc))
        p4 = (p1 - p3) / p2 - parm_infl
        sigma_o = 2.0 / p3 * ((parm_infl * p2 + p3) / p2) ** 2
        g = SIGMA_B**2 / (sigma_o + SIGMA_B**2)
        out["infl"] = parm_infl + g * p4
    else:
        out["infl"] = parm_infl
    return out


def rtpp_np(w, infl, alpha):
    K = w.shape[0]
    return (1 - alpha) * w + alpha * np.sqrt(infl) * np.eye(K)


def rtps_np(w, pao, xb, infl, alpha):
    K = w.shape[0]
    var_g = float(xb @ xb)
    var_a = float(xb @ pao @ xb)
    if var_g > 0 and var_a > 0:
        m = alpha * np.sqrt(var_g * infl / (var_a * (K - 1))) - alpha + 1.0
        return w * m, m
    return w.copy(), 1.0


def total_weight_np(wrlx, transm, beta):
    K = wrlx.shape[0]
    w = (wrlx + transm[:, None]) * beta
    w[np.diag_indices(K)] += 1.0 - beta
    return w

"""Restart checkpointing: the cycle-granularity state persistence layer.

Equivalent of the reference's per-member NetCDF restart machinery
(reference: common_scale.f90 write_restart :558 / read_restart :317;
member-file naming via filename_replace_mem, common_nml.f90:328-331,1038 —
'@@@@' / '<member>' templates, special members 'mean' and 'mdet';
cycle-resume semantics: every analysis writes full restarts so any cycle
boundary is a resume point, SURVEY §5 checkpoint/resume).

Storage is a directory of .npz member files plus a JSON manifest — a
single-controller design (no per-rank files); sharded arrays are gathered
through jax.device_get. Cycled auxiliary state (adaptive inflation field)
is stored alongside (INFL_MUL_OUT_BASENAME analogue).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict
from pathlib import Path

import numpy as np
import jax

from scale_letkf_tpu.model.dycore import DycoreState


def filename_replace_mem(template: str, member: int | str) -> str:
    """'@@@@' or '<member>' → zero-padded member number / 'mean' / 'mdet'
    (common_nml.f90:1038-1080)."""
    if isinstance(member, str):
        rep = member
    else:
        rep = f"{member + 1:04d}"
    out = template.replace("<member>", rep)
    if "@@@@" in out:
        out = out.replace("@@@@", rep)
    return out


def save_ensemble(
    dirpath: str | Path,
    ens: DycoreState,
    basename: str = "anal.@@@@",
    aux: dict[str, np.ndarray] | None = None,
    meta: dict | None = None,
    det: DycoreState | None = None,
):
    """Write one member file per ensemble member + manifest + aux fields.
    `det` is the optional deterministic member (DET_RUN, common_nml.f90:46),
    stored under the 'mdet' member name (mmdet = MEMBER+2 in the reference,
    common_mpi_scale.f90:468-507)."""
    d = Path(dirpath)
    d.mkdir(parents=True, exist_ok=True)
    host = jax.device_get(ens)
    K = host.rho.shape[0]
    names = []
    for m in range(K):
        fname = filename_replace_mem(basename, m) + ".npz"
        np.savez(d / fname,
                 rho=host.rho[m], rhou=host.rhou[m], rhov=host.rhov[m],
                 rhow=host.rhow[m], rhot=host.rhot[m], rhoq=host.rhoq[m])
        names.append(fname)
    if det is not None:
        save_member(d / (filename_replace_mem(basename, "mdet") + ".npz"),
                    det)
    if aux:
        for k, v in aux.items():
            np.savez(d / f"{k}.npz", data=np.asarray(v))
    manifest = {
        "members": K,
        "basename": basename,
        "files": names,
        "det": det is not None,
        "aux": sorted(aux) if aux else [],
        "meta": meta or {},
    }
    (d / "manifest.json").write_text(json.dumps(manifest, indent=1))


def load_ensemble(dirpath: str | Path, basename: str | None = None
                  ) -> tuple[DycoreState, dict[str, np.ndarray], dict]:
    """Load an ensemble checkpoint; returns (state, aux, meta)."""
    d = Path(dirpath)
    manifest = json.loads((d / "manifest.json").read_text())
    basename = basename or manifest["basename"]
    K = manifest["members"]
    fields = {k: [] for k in ("rho", "rhou", "rhov", "rhow", "rhot", "rhoq")}
    for m in range(K):
        z = np.load(d / (filename_replace_mem(basename, m) + ".npz"))
        for k in fields:
            fields[k].append(z[k])
    ens = DycoreState(**{k: np.stack(v) for k, v in fields.items()})
    aux = {}
    for k in manifest.get("aux", []):
        aux[k] = np.load(d / f"{k}.npz")["data"]
    return ens, aux, manifest.get("meta", {})


def load_det(dirpath: str | Path) -> DycoreState | None:
    """Load the deterministic member from a checkpoint, if present
    (DET_RUN_CYCLED semantics: its presence in the prior analysis makes it
    cycle, common_mpi_scale.f90:492-498)."""
    d = Path(dirpath)
    manifest = json.loads((d / "manifest.json").read_text())
    if not manifest.get("det"):
        return None
    return load_member(
        d / (filename_replace_mem(manifest["basename"], "mdet") + ".npz"))


def save_history(dirpath: str | Path, hist: np.ndarray,
                 basename: str = "hist.@@@@",
                 slot_ids: list[int] | None = None):
    """Per-slot history snapshots for the 4-D observation operator
    (the reference's model history output read per slot by obsope,
    read_history common_scale.f90:903 / obsope_tools.f90:431-508).

    hist: (K, S, NV3D, nz, ny, nx) analysis-variable stacks per member and
    time slot."""
    d = Path(dirpath)
    d.mkdir(parents=True, exist_ok=True)
    hist = np.asarray(jax.device_get(hist))
    K = hist.shape[0]
    for m in range(K):
        np.savez(d / (filename_replace_mem(basename, m) + ".npz"),
                 hist=hist[m])
    (d / "hist.json").write_text(json.dumps({
        "members": K, "slots": int(hist.shape[1]), "basename": basename,
        "slot_ids": slot_ids or list(range(1, hist.shape[1] + 1))}))


def load_history(dirpath: str | Path) -> np.ndarray | None:
    """Load per-slot history snapshots; None if the checkpoint has none."""
    d = Path(dirpath)
    if not (d / "hist.json").exists():
        return None
    meta = json.loads((d / "hist.json").read_text())
    out = []
    for m in range(meta["members"]):
        z = np.load(d / (filename_replace_mem(meta["basename"], m) + ".npz"))
        out.append(z["hist"])
    return np.stack(out)


def save_member(path: str | Path, s: DycoreState):
    host = jax.device_get(s)
    np.savez(path, rho=host.rho, rhou=host.rhou, rhov=host.rhov,
             rhow=host.rhow, rhot=host.rhot, rhoq=host.rhoq)


def load_member(path: str | Path) -> DycoreState:
    z = np.load(path)
    return DycoreState(rho=z["rho"], rhou=z["rhou"], rhov=z["rhov"],
                       rhow=z["rhow"], rhot=z["rhot"], rhoq=z["rhoq"])

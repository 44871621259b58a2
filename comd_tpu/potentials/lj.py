"""Lennard-Jones 12-6 potential for Cu (reference: src-mpi/ljForce.c:101-120).

Parameters from Wolf & Phillpot (sigma=2.315 A, epsilon=0.167 eV) with the
POT_SHIFT=1.0 energy shift so U(rCut)=0 (ljForce.c:83, 166-167).  The pair
math lives in ops/force_lj.py (XLA) and ops/pallas/stencil.py (TPU kernel);
this module is parameters only.

Cutoff note: the reference fork sets cutoff = 5*sigma (ljForce.c:114), but
its own documented cohesive-energy golden -1.243619295058 (CoMD.c:896) and
its MAXATOMS=64 cell capacity both correspond to the upstream CoMD 1.1 value
2.5*sigma (a 5*sigma cell holds ~131 FCC Cu atoms, overflowing MAXATOMS; the
fork's run matrix only exercises EAM).  We default to the golden-consistent
2.5*sigma; the fork's configuration is available as --ljCutoffFactor 5
(Config.lj_cutoff_factor), where the auto capacity sizing (cells.plan_cells)
absorbs the ~176-atom commensurate cells.  The 5-sigma T=0 cohesive energy
is -1.406590686466 eV/atom (computed with this code's f64 path, identical
at 8^3 and 10^3 lattices; the reference publishes no golden for its
5-sigma configuration).
"""
from __future__ import annotations

import dataclasses

from ..constants import AMU_TO_INTERNAL_MASS

POT_SHIFT = 1.0


@dataclasses.dataclass(frozen=True)
class LjPotential:
    name: str = "Cu"
    atomic_no: int = 29
    sigma: float = 2.315                  # Angstrom
    epsilon: float = 0.167                # eV
    mass: float = 63.55 * AMU_TO_INTERNAL_MASS
    lat: float = 3.615                    # Angstrom
    lattice_type: str = "FCC"
    cutoff: float = 2.5 * 2.315           # 2.5 * sigma (see module docstring)

    @property
    def s6(self) -> float:
        return self.sigma ** 6

    @property
    def e_shift(self) -> float:
        """POT_SHIFT * rCut6 * (rCut6 - 1), ljForce.c:166-167."""
        r_cut2 = self.cutoff * self.cutoff
        r_cut6 = self.s6 / (r_cut2 * r_cut2 * r_cut2)
        return POT_SHIFT * r_cut6 * (r_cut6 - 1.0)

    def describe(self) -> list[tuple[str, str]]:
        return [
            ("Potential type", "Lennard-Jones"),
            ("Species name", self.name),
            ("Atomic number", str(self.atomic_no)),
            ("Mass", f"{self.mass / AMU_TO_INTERNAL_MASS:g} amu"),
            ("Lattice Type", self.lattice_type),
            ("Lattice spacing", f"{self.lat:g} Angstroms"),
            ("Cutoff", f"{self.cutoff:g} Angstroms"),
            ("Epsilon", f"{self.epsilon:g} eV"),
            ("Sigma", f"{self.sigma:g} Angstroms"),
        ]


def init_lj_pot(cutoff_factor: float = 2.5) -> LjPotential:
    """``cutoff_factor``: cutoff in units of sigma.  2.5 (default) matches
    the upstream CoMD golden; 5.0 is the reference fork's ljForce.c:114."""
    sigma = LjPotential.sigma
    return LjPotential(cutoff=cutoff_factor * sigma)

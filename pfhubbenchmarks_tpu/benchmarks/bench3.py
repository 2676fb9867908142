"""PFHub Benchmark 3: dendritic solidification — Allen-Cahn + heat equation.

Reference: dolfin/bench3.py — 960x960 domain, 350x350 crossed mesh (:21-23),
params W0=1, m=4, eps_m=0.05, tau0=1, D=10, undercooling Delta=-0.3 (:32-38),
lambda = D tau0 / (0.6267 W0^2) (:67), circular seed IC (pfbase.py:293-320)
with r=8, w=1, vin=1, vout=-1 (:52-58), latent-heat coupling: the U equation
gets 0.5 * dphi/dt with the time derivative substituted by the implicit AC
right-hand side (:88-93). Anisotropy a(theta) is authored but disabled in the
reference because of atan NaNs (:72-81); here it's implemented with atan2
(fixing the reference's quirk) behind ``anisotropy=True``, default off to
match the committed CSVs.

Aborts when total free energy goes negative (:254-258).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from pfhubbenchmarks_tpu.benchmarks.base import BenchmarkProblem
from pfhubbenchmarks_tpu.config import SolverConfig, TimeConfig
from pfhubbenchmarks_tpu.fem.grid import CrossedTriGrid
from pfhubbenchmarks_tpu.models import forms


@dataclasses.dataclass(frozen=True)
class Bench3Params:
    W0: float = 1.0
    m: int = 4
    epsilon_m: float = 0.05
    theta0: float = 0.0
    tau0: float = 1.0
    D: float = 10.0
    Delta: float = -0.3
    r_ic: float = 8.0
    w_ic: float = 1.0
    v_in: float = 1.0
    v_out: float = -1.0

    @property
    def lam(self) -> float:
        return self.D * self.tau0 / (0.6267 * self.W0 ** 2)


def ic_phi(p: Bench3Params):
    """Circular seed at the domain corner (pfbase.py:301-317)."""

    def fn(x, y):
        r = np.sqrt(x ** 2 + y ** 2)
        mid = p.v_out + 0.5 * (p.v_in - p.v_out) * (
            1.0 + np.cos(np.pi * (r - p.r_ic + 0.5 * p.w_ic) / p.w_ic))
        return np.where(
            r < p.r_ic - 0.5 * p.w_ic, p.v_in,
            np.where(r > p.r_ic + 0.5 * p.w_ic, p.v_out, mid))

    return fn


def make(nx: int = 350, ny: int = 350, Lx: float = 960.0, Ly: float = 960.0,
         params: Bench3Params = Bench3Params(), pad_to: tuple = (1, 1), anisotropy: bool = False,
         **overrides) -> BenchmarkProblem:
    p = params
    lam = p.lam

    def f_chem(U, phi):
        return (-0.5 * phi ** 2 + 0.25 * phi ** 4
                + lam * U * phi * (1.0 - 2.0 / 3.0 * phi ** 2 + 0.2 * phi ** 4))

    def dfdp(U, phi):
        # (phi - lam U (1 - phi^2)) (1 - phi^2) = -d f_chem / d phi
        return (phi - lam * U * (1.0 - phi ** 2)) * (1.0 - phi ** 2)

    def aniso(dphi):
        """a(theta) = 1 + eps_m cos(m (theta - theta0)) and a'(theta), with
        atan2 (the reference's atan version produced NaNs and was disabled,
        dolfin/bench3.py:72-77).

        AD-safe: where grad(phi) = 0 (the bulk), atan2's derivative is NaN;
        substitute a unit direction there and select a=1, a'=0 — the
        double-where pattern keeps the Jacobian-vector products finite."""
        g2 = dphi[0] ** 2 + dphi[1] ** 2
        safe = g2 > 1e-20
        dx = jnp.where(safe, dphi[0], 1.0)
        dy = jnp.where(safe, dphi[1], 0.0)
        theta = jnp.arctan2(dy, dx)
        a = 1.0 + p.epsilon_m * jnp.cos(p.m * (theta - p.theta0))
        aprime = -p.epsilon_m * p.m * jnp.sin(p.m * (theta - p.theta0))
        return jnp.where(safe, a, 1.0), jnp.where(safe, aprime, 0.0)

    def terms(ctx):
        U, phi = ctx.u
        U0, phi0 = ctx.u0
        dU, dphi = ctx.du
        if anisotropy:
            a, aprime = aniso(dphi)
            # corner-force terms: the variational derivative of the
            # anisotropic gradient energy 1/2 W(theta)^2 |grad phi|^2 is
            #   -div( W^2 grad phi + W W' |grad phi|^2 d theta/d grad phi )
            # and with theta = atan2(phi_y, phi_x),
            # |grad phi|^2 * d theta/d grad phi = (-phi_y, phi_x), giving the
            # Kobayashi rotation flux W W' (-phi_y, phi_x) (Kobayashi 1993;
            # the term the reference's disabled code never included — ADVICE
            # round 1 flagged the W W' omission).
            wwp = p.W0 ** 2 * a * aprime
        else:
            a = 1.0
            wwp = 0.0
        W2 = (p.W0 * a) ** 2
        inv_tau = 1.0 / (p.tau0 * a ** 2)
        g = dfdp(U, phi)
        rot = (-wwp * dphi[1], wwp * dphi[0])
        # U equation: diffusion + 0.5 * dphi/dt substituted by AC RHS
        # (dolfin/bench3.py:88-93) — including the rotation flux so the
        # substitution stays exact under anisotropy
        src_U = (U - U0) / ctx.dt - 0.5 * inv_tau * g
        flux_U = (p.D * dU[0] + 0.5 * inv_tau * (W2 * dphi[0] + rot[0]),
                  p.D * dU[1] + 0.5 * inv_tau * (W2 * dphi[1] + rot[1]))
        # phi equation: AC with L = 1/tau, kappa = W^2, dfdeta = -dfdp
        src_p, flux_p = forms.allen_cahn(phi, dphi, phi0, ctx.dt, inv_tau, W2, -g)
        flux_p = (flux_p[0] + inv_tau * rot[0], flux_p[1] + inv_tau * rot[1])
        return [src_U, src_p], [flux_U, flux_p]

    def tfe_density(ctx):
        U, phi = ctx.u
        dphi = ctx.du[1]
        if anisotropy:
            a, _ = aniso(dphi)
        else:
            a = 1.0
        return f_chem(U, phi) + 0.5 * (p.W0 * a) ** 2 * (dphi[0] ** 2 + dphi[1] ** 2)

    return BenchmarkProblem(
        name="bench3",
        grid=CrossedTriGrid(nx, ny, Lx, Ly, pad_to=pad_to),
        field_names=("U", "phi"),
        terms=terms,
        ic_fns=[lambda x, y: np.full_like(np.asarray(x, float), p.Delta), ic_phi(p)],
        observables={
            "total_free_energy": tfe_density,
            "solid_fraction": lambda ctx: 0.5 * (ctx.u[1] + 1.0),
        },
        observable_scale={"solid_fraction": 1.0 / (Lx * Ly)},
        csv_columns=("time", "total_free_energy", "solid_fraction"),
        time=TimeConfig(dt0=1e-2, dt_min=1e-4, end_time=100.0, grow_threshold=5),
        # precond_rule dunavant2: krylov 51 -> 56 over 5 steps at 140^2 (r3
        # lab); dunavant1 degrades the reaction-dominated AC block (x4.4)
        # nu 3/3: measured optimum with the exact dense 7^2 coarse solve
        # (r3 TPU scan: 24.4 s @ nu2/2 -> 20.8 s @ nu3/3, krylov 2400->2049)
        # fuse_vcycle split_levels: per-level descend/ascend kernels with
        # the exact dense 7^2 coarse OUTSIDE the kernels — measured 11.2 s
        # / 1866 accepted Krylov vs 13.2 s / 3141 for the monolithic-tail
        # split (in-kernel 24-sweep coarse) and 20.3 s for the pre-split
        # strided-transfer cycle (r3, .scratch/prof_r5{a,c}.log)
        # gmg_nu_fine_pre 1: one pre-sweep on the 350² fine level (full 3/3
        # below) — 11.44 -> 11.09 s, krylov 1911 -> 2042 accepted but the
        # cheaper fine phase wins; trajectory identical (chain_r29 b3_nf12)
        solver=SolverConfig(line_search="basic", precond_rule="dunavant2",
                            gmg_nu_pre=3, gmg_nu_post=3,
                            gmg_nu_fine_pre=1,
                            fuse_vcycle="split_levels",
                            krylov_atol_frac=0.1),
        abort_condition=lambda row: row["total_free_energy"] < 0.0,
        abort_device=lambda row: row[1] < 0.0,
        **overrides,
    )


if __name__ == "__main__":
    from pfhubbenchmarks_tpu.benchmarks.registry import main

    main("bench3")

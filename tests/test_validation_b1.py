"""Physics validation B1 (doc/validationtests.pdf, "Hercules
Benchmarks"): a double-couple point source in a homogeneous full space
compared against the analytic moment-tensor solution (Aki & Richards
2002, eq. 4.32-4.33: near-, intermediate-, and far-field terms).

B1 material: rho = 1500, Vp = 3474, Vs = 2000, no damping.  The domain
is scaled down (the original 30 km^3 box at 250 m stations is just a
larger instance of the same problem); the comparison window ends
before boundary/free-surface reflections reach the station."""

import numpy as np
import pytest

import jax.numpy as jnp

from hercules_tpu.config import load_params
from hercules_tpu.solver.assemble import assemble
from hercules_tpu.solver.step import run_solver
from hercules_tpu.mesh import Octree, extract_mesh
from hercules_tpu.mesh.locate import locate_points, local_coords
from hercules_tpu.mesh.octree import PIXELLEVEL
from hercules_tpu.source.model import source_initnodalforce
from hercules_tpu.source.slip import compute_source_function

RHO, VP, VS = 1500.0, 3474.0, 2000.0


def analytic_moment_response(M, obs, src, times, m_of_t, dt):
    """u(t) [T, 3] at obs for moment tensor history M * m_of_t(t)
    (Aki & Richards eq. 4.32-4.33)."""
    r_vec = np.asarray(obs) - np.asarray(src)
    r = np.linalg.norm(r_vec)
    g = r_vec / r
    d = np.eye(3)

    RN = np.zeros((3, 3, 3))
    RIP = np.zeros((3, 3, 3))
    RIS = np.zeros((3, 3, 3))
    RFP = np.zeros((3, 3, 3))
    RFS = np.zeros((3, 3, 3))
    for n in range(3):
        for p in range(3):
            for q in range(3):
                gggg = g[n] * g[p] * g[q]
                RN[n, p, q] = (15 * gggg - 3 * g[n] * d[p, q]
                               - 3 * g[p] * d[n, q] - 3 * g[q] * d[n, p])
                RIP[n, p, q] = (6 * gggg - g[n] * d[p, q]
                                - g[p] * d[n, q] - g[q] * d[n, p])
                RIS[n, p, q] = -(6 * gggg - g[n] * d[p, q]
                                 - g[p] * d[n, q] - 2 * g[q] * d[n, p])
                RFP[n, p, q] = gggg
                RFS[n, p, q] = -(g[n] * g[p] - d[n, p]) * g[q]

    def contract(R):
        return np.einsum("npq,pq->n", R, M)

    aN = contract(RN)
    aIP = contract(RIP)
    aIS = contract(RIS)
    aFP = contract(RFP)
    aFS = contract(RFS)

    def m_at(t):
        """m(t) with m = 0 for t < 0, clamped interpolation."""
        idx = np.clip(t / dt, 0, len(m_of_t) - 1)
        lo = np.floor(idx).astype(int)
        hi = np.minimum(lo + 1, len(m_of_t) - 1)
        f = idx - lo
        v = (1 - f) * m_of_t[lo] + f * m_of_t[hi]
        return np.where(t < 0, 0.0, v)

    mdot = np.gradient(m_of_t, dt)

    def mdot_at(t):
        idx = np.clip(t / dt, 0, len(mdot) - 1)
        lo = np.floor(idx).astype(int)
        hi = np.minimum(lo + 1, len(mdot) - 1)
        f = idx - lo
        v = (1 - f) * mdot[lo] + f * mdot[hi]
        return np.where(t < 0, 0.0, v)

    ta = r / VP
    tb = r / VS
    # near-field integral: int_{r/a}^{r/b} tau m(t - tau) dtau
    ntau = 200
    taus = np.linspace(ta, tb, ntau)
    dtau = taus[1] - taus[0]
    near = np.zeros(len(times))
    for tau in taus:
        near += tau * m_at(times - tau) * dtau

    u = np.zeros((len(times), 3))
    for n in range(3):
        u[:, n] = (aN[n] * near / r ** 4
                   + aIP[n] * m_at(times - ta) / (VP ** 2 * r ** 2)
                   + aIS[n] * m_at(times - tb) / (VS ** 2 * r ** 2)
                   + aFP[n] * mdot_at(times - ta) / (VP ** 3 * r)
                   + aFS[n] * mdot_at(times - tb) / (VS ** 3 * r))
    return u / (4 * np.pi * RHO)


@pytest.mark.parametrize("station_offset", [(600.0, 400.0, 200.0)])
def test_b1_dipole_matches_analytic(station_offset):
    # ---- mesh a homogeneous cube ----
    # 16 points/wavelength at the Ricker central frequency (1/Tp =
    # 2.5 Hz -> lambda_S = 800 m, edge = 50 m); coarser sampling makes
    # the trilinear-element S wave visibly dispersive.
    L = 3200.0
    edge = 50.0
    p = load_params("/root/reference/examples/simple/in/physics.in",
                    "/root/reference/examples/simple/in/numerical.in")
    p.region_length_east_m = L
    p.region_length_north_m = L
    p.region_depth_deep_m = L
    p.type_of_damping = "none"
    p.delta_t = 0.006
    p.end_time = 1.62
    p.finalize()

    tree = Octree.newtree(L, L, L)

    def setrec(tr, hi, lo, lv):
        e = tr.ticksize * (np.int64(1) << (PIXELLEVEL
                                           - lv.astype(np.int64)))
        return {"e": e}

    def toexpand(tr, hi, lo, lv, rec):
        return rec["e"] > edge

    tree.refine(setrec, toexpand)
    mesh = extract_mesh(tree)
    E = mesh.lenum
    assert E == 64 ** 3
    mesh.props = {"Vp": np.full(E, VP), "Vs": np.full(E, VS),
                  "rho": np.full(E, RHO)}
    for nm in ("shear", "kappa"):
        for c in ("a0", "a1", "g0", "g1", "b"):
            mesh.props[f"{c}_{nm}"] = np.zeros(E)

    tables = assemble(mesh, p)

    # ---- double couple at the center, Ricker slip ----
    strike, dip, rake = 30.0, 60.0, 45.0
    M0 = 1e13
    # element-centered so the discrete couple (shape-function
    # derivatives at the source point) is symmetric
    src = np.array([L / 2 + edge / 2, L / 2 + edge / 2,
                    L / 2 + edge / 2])
    T = p.total_steps
    times = p.delta_t * np.arange(T)
    Ts, Tp = 0.6, 0.4
    decay = compute_source_function("ricker", times, Ts=Ts, Tp=Tp)
    m_of_t = M0 * decay

    found, eidx = locate_points(mesh, [src[0]], [src[1]], [src[2]])
    assert found[0]
    e = int(eidx[0])
    et = mesh.edgeticks()[e]
    ts = mesh.ticksize
    center = np.array([ts * (mesh.elem_x[e] + et / 2.0),
                       ts * (mesh.elem_y[e] + et / 2.0),
                       ts * (mesh.elem_z[e] + et / 2.0)])
    nodal = source_initnodalforce(strike, dip, rake,
                                  src[0] - center[0], src[1] - center[1],
                                  src[2] - center[2], edge)
    lnids = mesh.elem_lnid[e]
    forces = decay[:, None, None] * (M0 * nodal)[None]  # [T, 8, 3]

    # ---- station ----
    obs = src + np.asarray(station_offset)
    stf, steidx = locate_points(mesh, [obs[0]], [obs[1]], [obs[2]])
    assert stf[0]
    cx, cy, cz = local_coords(mesh, steidx, [obs[0]], [obs[1]], [obs[2]])
    xi = np.array([[-1, 1, -1, 1, -1, 1, -1, 1],
                   [-1, -1, 1, 1, -1, -1, 1, 1],
                   [-1, -1, -1, -1, 1, 1, 1, 1]], np.float64)
    phi = ((1 + xi[0] * cx[0]) * (1 + xi[1] * cy[0])
           * (1 + xi[2] * cz[0]) / 8.0)
    st_nodes = mesh.elem_lnid[steidx]
    _, samples = run_solver(tables, lnids.astype(np.int32), forces, T,
                            p.delta_t, st_nodes=st_nodes,
                            st_phi=phi[None, :], dtype=jnp.float64)
    u_num = samples[:, 0, :]

    # ---- analytic ----
    s, dp, r_ = np.radians([strike, dip, rake])
    n = np.array([-np.sin(s) * np.sin(dp), np.cos(s) * np.sin(dp),
                  -np.cos(dp)])
    tvec = np.array([
        np.cos(r_) * np.sin(np.pi / 2 - s)
        + np.sin(r_) * np.sin(s) * np.cos(dp),
        np.cos(r_) * np.sin(s) - np.sin(r_) * np.cos(s) * np.cos(dp),
        -np.sin(r_) * np.sin(dp)])
    M = M0 * (np.outer(n, tvec) + np.outer(tvec, n)) / M0
    M = np.outer(n, tvec) + np.outer(tvec, n)
    u_ana = analytic_moment_response(M, obs, src, times, m_of_t,
                                     p.delta_t)

    # window before free-surface S reflections (src -> surface -> obs
    # >= 3450 m / Vs = 1.7 s; side dashpots absorb the rest).
    #
    # Residual misfit is the S-wave grid dispersion of the Ricker's
    # high-frequency tail (~6 points/wavelength at 2.5x the central
    # frequency -> the S pulse arrives ~1 time step late), the same
    # trilinear-element discretization error the reference has.
    w = times < 1.58
    corr = np.corrcoef(u_num[w].ravel(), u_ana[w].ravel())[0, 1]
    rms = (np.sqrt(((u_num[w] - u_ana[w]) ** 2).mean())
           / np.sqrt((u_ana[w] ** 2).mean()))
    assert corr > 0.98, f"waveform correlation {corr}"
    assert rms < 0.20, f"relative RMS misfit {rms}"
    for c in range(3):
        pk_n = np.abs(u_num[w, c]).max()
        pk_a = np.abs(u_ana[w, c]).max()
        assert abs(pk_n - pk_a) / pk_a < 0.05, \
            f"comp {c} peak amplitude error {abs(pk_n - pk_a) / pk_a}"

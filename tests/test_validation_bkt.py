"""Physics validation of the BKT constant-Q viscoelastic damping
(BASELINE.md bench config 4): does the implemented memory-variable
recursion (damping.c:110-416 semantics, solver/step.py element_forces)
actually deliver the target quality factor and the predicted velocity
dispersion?

Method: propagate a band-limited Ricker pulse from a point force
through a homogeneous medium twice -- damping "none" vs "bkt" with one
QTABLE coefficient row (psolve.c:5578-5604) -- on identical mesh,
source, and stations.  The spectral ratio of the two runs isolates the
attenuation operator exactly (geometric spreading, near-field terms,
source spectrum, boundary effects, and grid dispersion are common-mode
and cancel):

    |U_bkt(f)| / |U_el(f)| = exp(-pi f t_path / Q_eff(f))

- S-wave leg: stations perpendicular to the force axis (pure far-field
  S direction), shear-Q rows 10 and 80; recovered pointwise Q at 2 and
  3 Hz must match the table Q (the medium's theoretical Q(w) from the
  complex modulus is within ~3% of the table value across the band).
- kappa leg: station along the force axis (pure far-field P), kappa-Q
  row 10 with elastic shear; the P-wave quality factor is predicted by
  1/Q_p = (kappa/M_p) / Q_kappa  (M_p = lambda + 2 mu).
- dispersion: the inter-station phase delay difference (bkt vs elastic)
  measures c_bkt(f)/c_el(f), which must match the model's dispersion
  relation  c(w) = Vs * sqrt(1 - a0 g0^2/(g0^2+w^2) - a1 g1^2/(g1^2+w^2))
  -- the same expression the reference's velocity dispersion correction
  applies at w = freq_vel/freq (psolve.c:7313-7328).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hercules_tpu.config import load_params
from hercules_tpu.material import QTABLE, bkt_attenuation, \
    search_quality_table
from hercules_tpu.solver.assemble import assemble
from hercules_tpu.solver.step import run_solver
from hercules_tpu.mesh import Octree, extract_mesh
from hercules_tpu.mesh.locate import locate_points, local_coords
from hercules_tpu.mesh.octree import PIXELLEVEL
from hercules_tpu.source.slip import compute_source_function

RHO, VP, VS = 2000.0, 3464.0, 2000.0
L = 2400.0            # domain edge (m); 64^3 elements of 37.5 m
FREQ = 5.0            # reference max frequency: constant-Q band [f/10, f]
DT = 0.005
T = 360               # 1.8 s
TS, TP = 0.4, 0.25    # Ricker: peak at TS, energy ~0.8-4 Hz
R_ST = 900.0          # station distance
R_ST1 = 500.0         # nearer S station (dispersion phase pair)
NFFT = 8192

_cache = {}


def _mesh():
    if "mesh" in _cache:
        return _cache["mesh"]
    tree = Octree.newtree(L, L, L)

    def setrec(tr, hi, lo, lv):
        e = tr.ticksize * (np.int64(1) << (PIXELLEVEL
                                           - lv.astype(np.int64)))
        return {"e": e}

    def toexpand(tr, hi, lo, lv, rec):
        return rec["e"] > 40.0

    tree.refine(setrec, toexpand)
    mesh = extract_mesh(tree)
    assert mesh.lenum == 64 ** 3
    _cache["mesh"] = mesh
    return mesh


def _props(mesh, q_shear=None, q_kappa=None):
    """Homogeneous props; QTABLE row coefficients for the requested
    channels (None = channel elastic), exactly what correct_properties
    installs after the Qs(Vs) fit quantizes to the table."""
    E = mesh.lenum
    props = {"Vp": np.full(E, VP), "Vs": np.full(E, VS),
             "rho": np.full(E, RHO)}
    for nm, q in (("shear", q_shear), ("kappa", q_kappa)):
        if q is None:
            for c in ("a0", "a1", "g0", "g1", "b"):
                props[f"{c}_{nm}"] = np.zeros(E)
        else:
            idx = int(search_quality_table(np.array([q]))[0])
            row = QTABLE[idx]
            for ci, c in enumerate(("a0", "a1", "g0", "g1", "b")):
                props[f"{c}_{nm}"] = np.full(E, row[ci + 1])
    return props


def _run(key, props, damping, source="zforce", steps=T):
    """Solve and sample the 3 stations: [0] S at (r,0,0), [1] S at
    (r1,0,0), [2] at (0,0,r).

    source "zforce": point force along z at the center node (pure
    far-field S toward stations 0/1); "explosion": isotropic moment
    via the element shape-function gradients, f^n = -M0 grad(phi_n)
    at the element center (pure P radiation everywhere -- the clean
    probe for the kappa channel)."""
    if key in _cache:
        return _cache[key]
    mesh = _mesh()
    p = load_params("/root/reference/examples/simple/in/physics.in",
                    "/root/reference/examples/simple/in/numerical.in")
    p.region_length_east_m = L
    p.region_length_north_m = L
    p.region_depth_deep_m = L
    p.type_of_damping = damping
    p.freq = FREQ
    p.delta_t = DT
    p.end_time = steps * DT
    p.finalize()
    mesh.props = props
    tables = assemble(mesh, p)

    times = DT * np.arange(steps)
    src = np.array([L / 2, L / 2, L / 2])
    found, eidx = locate_points(mesh, [src[0]], [src[1]], [src[2]])
    assert found[0]
    decay = compute_source_function("ricker", times, Ts=TS, Tp=TP)
    xi0 = np.array([[-1, 1, -1, 1, -1, 1, -1, 1],
                    [-1, -1, 1, 1, -1, -1, 1, 1],
                    [-1, -1, -1, -1, 1, 1, 1, 1]], np.float64)
    if source == "zforce":
        src_node = np.array([mesh.elem_lnid[int(eidx[0])][0]], np.int32)
        forces = np.zeros((steps, 1, 3))
        forces[:, 0, 2] = 1e10 * decay
    else:
        e = int(eidx[0])
        src_node = mesh.elem_lnid[e].astype(np.int32)
        h = mesh.edge_m[e]
        nodal = -(xi0.T) / (4 * h)      # [8, 3] = -grad(phi_n) * M0
        forces = 1e13 * decay[:, None, None] * nodal[None]

    obs = [src + np.array([R_ST, 0, 0]), src + np.array([R_ST1, 0, 0]),
           src + np.array([0, 0, R_ST])]
    ox = [o[0] for o in obs]
    oy = [o[1] for o in obs]
    oz = [o[2] for o in obs]
    stf, steidx = locate_points(mesh, ox, oy, oz)
    assert stf.all()
    cx, cy, cz = local_coords(mesh, steidx, ox, oy, oz)
    phi = ((1 + xi0[0][None] * cx[:, None])
           * (1 + xi0[1][None] * cy[:, None])
           * (1 + xi0[2][None] * cz[:, None]) / 8.0)
    st_nodes = mesh.elem_lnid[steidx]
    _, samples = run_solver(tables, src_node, forces, steps, DT,
                            st_nodes=st_nodes, st_phi=phi,
                            dtype=jnp.float64)
    _cache[key] = np.asarray(samples)
    return _cache[key]


def _elastic():
    return _run("none", _props(_mesh()), "none")


def _pointwise_q(u_bkt, u_el, t_path, freqs):
    """Q_eff(f) from the spectral ratio at the given frequencies."""
    f = np.fft.rfftfreq(NFFT, DT)
    fe = np.abs(np.fft.rfft(u_el, NFFT))
    fb = np.abs(np.fft.rfft(u_bkt, NFFT))
    with np.errstate(divide="ignore", invalid="ignore"):
        qpt = -np.pi * f * t_path / np.log(fb / fe)
    return np.interp(freqs, f, qpt)


@pytest.mark.parametrize("q_target", [10.0, 80.0])
def test_bkt_q_recovery_shear(q_target):
    el = _elastic()
    bk = _run(f"bkt_s{q_target}", _props(_mesh(), q_shear=q_target),
              "bkt")
    q = _pointwise_q(bk[:, 0, 2], el[:, 0, 2], R_ST / VS, [2.0, 3.0])
    for qm in q:
        assert abs(qm - q_target) / q_target < 0.12, \
            f"shear Q recovered {q} vs target {q_target}"


def test_bkt_q_recovery_kappa():
    """Volumetric (kappa) channel: P-wave Q from an explosion source
    (pure P radiation -- a z-force's on-axis trace is dominated by
    elastic near-field/S-time terms that mask the kappa decay) with
    elastic shear: 1/Q_p = (kappa / M_p) / Q_kappa, M_p = rho Vp^2."""
    q_k = 10.0
    TE = 280
    el = _run("expl_none", _props(_mesh()), "none", source="explosion",
              steps=TE)
    bk = _run("expl_k10", _props(_mesh(), q_kappa=q_k), "bkt",
              source="explosion", steps=TE)
    mu = RHO * VS ** 2
    m_p = RHO * VP ** 2
    kappa = m_p - 4.0 / 3.0 * mu
    qp_pred = q_k * m_p / kappa
    # radial (x) component at the x station; band center of the Ricker
    q = _pointwise_q(bk[:, 0, 0], el[:, 0, 0], R_ST / VP, [2.0, 2.5])
    for qm in q:
        assert abs(qm - qp_pred) / qp_pred < 0.15, \
            f"kappa-channel P Q recovered {q} vs predicted {qp_pred}"


def test_bkt_dispersion_relation():
    """Measured phase-velocity ratio c_bkt/c_el between the two S
    stations matches the model dispersion relation -- the expression
    the reference's velocity correction evaluates at w = freq_vel/freq
    (psolve.c:7313-7328)."""
    q_target = 10.0
    el = _elastic()
    bk = _run(f"bkt_s{q_target}", _props(_mesh(), q_shear=q_target),
              "bkt")
    f = np.fft.rfftfreq(NFFT, DT)
    times = DT * np.arange(T)

    def pair_phase(s):
        # Hanning-windowed S pulses (the full trace's multiple arrivals
        # make the unwrapped phase ill-defined); unwrap the
        # inter-station phase DIFFERENCE, then restore the window
        # start-time offsets
        specs = []
        for st, r in ((0, R_ST), (1, R_ST1)):
            ta = TS + r / VS
            w = (times > ta - 0.32) & (times < ta + 0.45)
            u = s[w, st, 2] * np.hanning(w.sum())
            specs.append((np.fft.rfft(u, NFFT), times[w][0]))
        (p2, t2), (p1, t1) = specs
        ph = np.unwrap(np.angle(p2) - np.angle(p1))
        return ph - 2 * np.pi * f * (t2 - t1)

    # inter-station phase delay, bkt minus elastic: the common-mode
    # source phase, grid dispersion, and near-field phase cancel
    dph = pair_phase(bk) - pair_phase(el)
    dr = R_ST - R_ST1
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_cb = 1.0 / VS - dph / (2 * np.pi * f * dr)

    idx = int(search_quality_table(np.array([q_target]))[0])
    a0, a1, g0, g1 = QTABLE[idx, 1:5]
    wn = f / FREQ
    pred = VS * np.sqrt(1 - (a0 * g0 ** 2 / (g0 ** 2 + wn ** 2)
                             + a1 * g1 ** 2 / (g1 ** 2 + wn ** 2)))
    band = (f >= 1.0) & (f <= 4.0)
    meas = 1.0 / inv_cb[band]
    rel = np.abs(meas / pred[band] - 1)
    assert rel.max() < 0.02, \
        f"dispersion relation max rel err {rel.max()}"
    # the dispersion sign is physical: velocity is below the unrelaxed
    # Vs across the band
    assert (meas < VS).all()


def test_dispersion_correction_factor():
    """The production correction (material.bkt_attenuation with
    freq_vel != 0) multiplies Vs by the model's corr(w_v) and rebuilds
    Vp from the corrected Vs -- reference-exact (psolve.c:7313-7328)."""
    p = load_params("/root/reference/examples/simple/in/physics.in",
                    "/root/reference/examples/simple/in/numerical.in")
    p.type_of_damping = "bkt"
    p.freq = FREQ
    p.freq_vel = 1.0
    p.use_infinite_qk = False
    p.finalize()
    vs = np.array([200.0, 500.0, 1200.0, 2500.0])
    vp = 2.0 * vs
    upd, vp2, vs2 = bkt_attenuation(vp.copy(), vs.copy(), p)

    w = p.freq_vel / p.freq
    a0, a1 = upd["a0_shear"], upd["a1_shear"]
    g0, g1 = upd["g0_shear"], upd["g1_shear"]
    corr = np.sqrt(1 - (a0 * g0 ** 2 / (g0 ** 2 + w * w)
                        + a1 * g1 ** 2 / (g1 ** 2 + w * w)))
    assert np.allclose(vs2, corr * vs, rtol=0, atol=1e-12)
    # correction lowers the unrelaxed-model velocity (arrivals of the
    # freq_vel band shift later, compensating the band's dispersion)
    assert (vs2 < vs).all() and (corr > 0.9).all()
    a0k, a1k = upd["a0_kappa"], upd["a1_kappa"]
    g0k, g1k = upd["g0_kappa"], upd["g1_kappa"]
    corrk = np.sqrt(1 - (a0k * g0k ** 2 / (g0k ** 2 + w * w)
                         + a1k * g1k ** 2 / (g1k ** 2 + w * w)))
    vk2 = vp * vp - 4.0 / 3.0 * vs * vs
    # off-table kappa Q (a0k == 0, e.g. stiff rock's Qk > 500) leaves
    # Vp uncorrected even though Vs moved -- reference gating (:7322)
    pred = np.where(a0k != 0,
                    np.sqrt(corrk ** 2 * vk2 + 4.0 / 3.0 * vs2 ** 2), vp)
    assert np.allclose(vp2, pred, rtol=0, atol=1e-12)
    assert (a0k == 0).any() and (a0k != 0).any()  # both branches hit


def test_bkt_coefficient_pipeline():
    """Brocher Qs(Vs) fit -> table quantization: the installed rows are
    QTABLE rows, selected by nearest Q (psolve.c:7252-7311)."""
    p = load_params("/root/reference/examples/simple/in/physics.in",
                    "/root/reference/examples/simple/in/numerical.in")
    p.type_of_damping = "bkt"
    p.freq = FREQ
    p.freq_vel = 0.0
    p.use_infinite_qk = True
    p.finalize()
    vs = np.array([300.0, 1000.0, 3000.0])
    vp = 2.0 * vs
    upd, vp2, vs2 = bkt_attenuation(vp.copy(), vs.copy(), p)
    # freq_vel == 0: no velocity change
    assert (vp2 == vp).all() and (vs2 == vs).all()
    vskm = vs * 0.001
    qs = 10.5 + vskm * (-16. + vskm * (153. + vskm * (-103. + vskm * (
        34.7 + vskm * (-5.29 + vskm * 0.31)))))
    idx = search_quality_table(qs)
    assert (idx >= 0).all()
    for ci, c in enumerate(("a0", "a1", "g0", "g1", "b")):
        assert np.array_equal(upd[f"{c}_shear"], QTABLE[idx, ci + 1])
    # infinite Qk -> Q=1000 > 500 -> no kappa attenuation
    for c in ("a0", "a1", "g0", "g1", "b"):
        assert (upd[f"{c}_kappa"] == 0).all()

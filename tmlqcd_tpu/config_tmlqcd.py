"""tmLQCD input-file compatibility reader.

Reference: read_input.l — the flex lexer parsing `Key = value` globals plus
`BeginMonomial <TYPE> ... EndMonomial`, `BeginOperator ...`,
`BeginMeasurement ...` blocks (survey §2.10 / Appendix B).  This reader
accepts that same grammar (case-insensitive keys, `#` comments) and lowers
it to tmlqcd_tpu.config.RunConfig, so existing tmLQCD input files drive
this framework with their original spellings where the concept carries over.

Not a flex port: a ~100-line recursive key-value parser covers the grammar
(the reference's 10k-line lexer is mostly generated tables).
"""

from __future__ import annotations

import re

from tmlqcd_tpu.config import (
    IntegratorSpec,
    MeasurementSpec,
    MonomialSpec,
    OperatorSpec,
    RunConfig,
)

__all__ = ["parse_input", "read_input"]

_BLOCK_RE = re.compile(
    r"^Begin(Monomial|Operator|Measurement)\s+(\S+)\s*$", re.IGNORECASE
)
_END_RE = re.compile(r"^End(Monomial|Operator|Measurement)\s*$", re.IGNORECASE)
_KV_RE = re.compile(r"^\s*([A-Za-z0-9_]+)\s*=\s*(.+?)\s*$")


def _tokenize(text: str):
    """Yield ('kv', key, value) and ('begin'/'end', kind, name) events."""
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        m = _BLOCK_RE.match(line)
        if m:
            yield ("begin", m.group(1).lower(), m.group(2).upper())
            continue
        m = _END_RE.match(line)
        if m:
            yield ("end", m.group(1).lower(), "")
            continue
        m = _KV_RE.match(line)
        if m:
            yield ("kv", m.group(1).lower(), m.group(2))


def _num(v: str) -> float:
    return float(v.replace("d", "e").replace("D", "E"))


def parse_input(text: str) -> RunConfig:
    """Parse a tmLQCD-style input text into a RunConfig."""
    _MONOMIAL_BLOCKS.clear()
    g: dict[str, str] = {}
    monomials: list[MonomialSpec] = []
    operators: list[OperatorSpec] = []
    meas: list[MeasurementSpec] = []
    block: dict | None = None
    block_kind = block_name = ""

    raw_blocks: list[tuple[str, str, dict]] = []
    for ev, a, b in _tokenize(text):
        if ev == "begin":
            block, block_kind, block_name = {}, a, b
        elif ev == "end":
            raw_blocks.append((block_kind, block_name, block))
            block = None
        else:  # kv
            (block if block is not None else g)[a] = b

    # global boundary phases (reference: boundary.c ThetaT/X/Y/Z keys;
    # theta_t = 1 -> antiperiodic time BC, the production convention) and
    # globally inherited physics parameters (reference: read_input.l fills
    # g_kappa/g_mu/g_c_sw first; blocks without their own keys inherit them)
    theta = (
        _num(g.get("thetat", g.get("theta0", "1.0"))),
        _num(g.get("thetax", g.get("theta1", "0.0"))),
        _num(g.get("thetay", g.get("theta2", "0.0"))),
        _num(g.get("thetaz", g.get("theta3", "0.0"))),
    )
    inherit = {k: g[k] for k in ("kappa", "2kappamu", "csw") if k in g}

    for block_kind, block_name, block in raw_blocks:
        blk = dict(inherit)
        blk.update(block)
        if block_kind == "monomial":
            monomials.append(_monomial(block_name, blk, theta))
        elif block_kind == "operator":
            operators.append(_operator(block_name, blk, theta))
        elif block_kind == "measurement":
            meas.append(_measurement(block_name, block))

    # integrator: tau + per-timescale IntegrationSteps from monomial blocks
    # (the reference puts integration steps on the monomials)
    nts = int(_num(g.get("numberoftimescales", g.get("numbertimescales", "0")) or 0))
    steps_by_ts: dict[int, int] = {}
    types_by_ts: dict[int, str] = {}
    for spec, blk in zip(monomials, _MONOMIAL_BLOCKS):
        ts = spec.timescale
        if "integrationsteps" in blk:
            steps_by_ts[ts] = int(_num(blk["integrationsteps"]))
        if "integratortype" in blk or "type" in blk:
            types_by_ts[ts] = blk.get("integratortype", blk.get("type", "2MN")).upper()
    n_levels = max(
        [nts] + [s.timescale + 1 for s in monomials] + [1]
    )
    steps = tuple(steps_by_ts.get(i, 1) for i in range(n_levels))
    types = tuple(types_by_ts.get(i, "2MN") for i in range(n_levels))
    integrator = IntegratorSpec(
        tau=_num(g.get("tau", "1.0")), steps=steps, types=types
    )

    def gi(key, default):
        return int(_num(g[key])) if key in g else default

    def gf(key, default):
        return _num(g[key]) if key in g else default

    def gb(key, default=False):
        """Boolean keys in the reference grammar are spelled yes/no (e.g.
        'UseStoutSmearing = yes', read_input.l BOOL tokens); accept
        yes/no/true/false/on/off/0/1."""
        if key not in g:
            return default
        v = g[key].strip().lower()
        if v in ("yes", "true", "on", "1"):
            return True
        if v in ("no", "false", "off", "0"):
            return False
        return bool(_num(v))

    # keys that exist in the reference but are structurally fixed here:
    # even/odd preconditioning is always on (the whole operator stack is
    # eo-packed) and the counter RNG is reproducible by construction
    # independent of decomposition (reference: ReproduceRandomNumbers)
    if g.get("useevenodd", "1").strip() in ("0", "no"):
        import warnings

        warnings.warn(
            "UseEvenOdd = 0 requested but this framework is always "
            "even/odd-preconditioned; proceeding with even/odd"
        )

    lx = gi("lx", gi("l", 4))
    # InitialStoreCounter = readin | N (reference: resume bookkeeping)
    isc_raw = g.get("initialstorecounter", "readin").strip().lower()
    isc = "readin" if isc_raw == "readin" else int(_num(isc_raw))
    return RunConfig(
        t=gi("t", 4),
        lx=lx,
        ly=gi("ly", lx),
        lz=gi("lz", lx),
        seed=gi("seed", 42),
        measurements=gi("measurements", 10),
        nsave=gi("nsave", 10),
        start_condition=g.get("startcondition", "hot").lower(),
        beta=gf("beta", 5.7),
        gauge_action={"0": "wilson"}.get(
            g.get("gaugeaction", "wilson").lower(), g.get("gaugeaction", "wilson").lower()
        ),
        integrator=integrator,
        monomials=tuple(monomials),
        operators=tuple(operators),
        meas=tuple(meas),
        reversibility_check=gb("reversibilitycheck", False),
        reversibility_interval=gi("reversibilitycheckintervall", 100),
        debug_level=gi("debuglevel", 1),
        initial_store_counter=isc,
        # SourceType spellings: Point / TimesliceZ2 ("Timeslice", "Z2" and
        # "Wall" accepted as aliases of the stochastic timeslice source)
        source_type={"timeslice": "timeslicez2", "z2": "timeslicez2",
                     "wall": "timeslicez2"}.get(
            g.get("sourcetype", "point").lower(),
            g.get("sourcetype", "point").lower()),
        source_timeslice=gi("sourcetimeslice", 0),
        use_source_smearing=gb("usesourcesmearing", gb("usesmearing", False)),
        jacobi_kappa=gf("jacobikappa", 0.21),
        jacobi_iterations=gi("jacobiiterations", 5),
        ape_alpha=gf("apealpha", 0.5),
        ape_iterations=gi("apeiterations", 4),
        use_stout_smearing=gb("usestoutsmearing", False),
        stout_rho=gf("stoutrho", 0.1),
        stout_iterations=gi("stoutnoiterations", 1),
        gauge_config_input=g.get("gaugeconfiginputfile", ""),
        gauge_write_precision=gi("gaugeconfigwriteprecision", 64),
        nr_procs=(gi("nrtprocs", 0), gi("nrxprocs", 0),
                  gi("nryprocs", 0), gi("nrzprocs", 0)),
    )


# side-channel: raw blocks in parse order so the integrator assembly above
# can read IntegrationSteps; reset per parse.
_MONOMIAL_BLOCKS: list[dict] = []


def _monomial(name: str, blk: dict, theta=(1.0, 0.0, 0.0, 0.0)) -> MonomialSpec:
    _MONOMIAL_BLOCKS.append(dict(blk))
    f = lambda k, d=0.0: _num(blk[k]) if k in blk else d
    i = lambda k, d=0: int(_num(blk[k])) if k in blk else d
    return MonomialSpec(
        type=name,
        timescale=i("timescale"),
        kappa=f("kappa"),
        two_kappa_mu=f("2kappamu"),
        two_kappa_mu2=f("2kappamu2"),
        csw=f("csw"),
        two_kappa_mubar=f("2kappamubar"),
        two_kappa_epsbar=f("2kappaepsbar"),
        rat_order=i("degreeofrational", i("rationalorder", 12)),
        stilde_min=f("stildemin", 1e-4),
        stilde_max=f("stildemax", 4.0),
        acceptance_precision=f("acceptanceprecision", 1e-18),
        force_precision=f("forceprecision", 1e-16),
        max_solver_iterations=i("maxsolveriterations", 5000),
        solver=blk.get("solver", "auto").lower(),
        csg_history=i("csghistory", 3),
        theta=theta,
        # SFGAUGE boundary-field keys (reference: sf_gauge_monomial.c; the
        # background-field parameters eta/nu and the c_t boundary weight)
        eta=f("eta"),
        nu=f("nu"),
        ct=f("ct", 1.0),
        name=blk.get("name", ""),
    )


def _operator(name: str, blk: dict, theta=(1.0, 0.0, 0.0, 0.0)) -> OperatorSpec:
    f = lambda k, d=0.0: _num(blk[k]) if k in blk else d
    i = lambda k, d=0: int(_num(blk[k])) if k in blk else d
    return OperatorSpec(
        type=name,
        kappa=f("kappa"),
        two_kappa_mu=f("2kappamu"),
        csw=f("csw"),
        two_kappa_mubar=f("2kappamubar"),
        two_kappa_epsbar=f("2kappaepsbar"),
        solver=blk.get(
            "solver", "sumr" if name.upper() == "OVERLAP" else "cg"
        ).lower(),
        precision=f("solverprecision", 1e-18),
        max_solver_iterations=i("maxsolveriterations", 5000),
        theta=theta,
        propagator_precision=i("propagatorprecision", 64),
        # overlap keys (reference: read_input.l overlap operator section —
        # `m` the overlap mass, `s` the kernel-mass parameter rho = 1+s)
        overlap_m=f("m", 0.0),
        overlap_s=f("s", 0.0),
        sign_degree=i("degreeofsignfunction", 128),
        sign_n_ev=i("noeigenvalues", 8),
    )


def _measurement(name: str, blk: dict) -> MeasurementSpec:
    f = lambda k, d=0.0: _num(blk[k]) if k in blk else d
    i = lambda k, d=0: int(_num(blk[k])) if k in blk else d
    return MeasurementSpec(
        type=name,
        frequency=i("frequency", 1),
        kappa=f("kappa"),
        two_kappa_mu=f("2kappamu"),
        flow_eps=f("stepsize", 0.02),
        flow_steps=i("steps", 50),
        direction=i("direction", 0),
        max_solver_iterations=i("maxsolveriterations", 5000),
        precision=f("solverprecision", 1e-18),
        eta=f("eta"),
        nu=f("nu"),
        ct=f("ct", 1.0),
    )


def read_input(path: str) -> RunConfig:
    """Read a tmLQCD input file (reference: read_input(filename))."""
    _MONOMIAL_BLOCKS.clear()
    with open(path) as fh:
        return parse_input(fh.read())

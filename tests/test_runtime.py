"""Runtime subsystem tests: checkpoint/resume, metrics, CLI, init strategies."""

import json
import os

import numpy as np
import pytest

from nmf_tpu import SolveConfig, kl_divergence, solve
from nmf_tpu.cli import main as cli_main
from nmf_tpu.io import binio
from nmf_tpu.models import init as init_mod
from nmf_tpu.utils import checkpoint as ckpt
from nmf_tpu.utils.metrics import MetricsLogger, summarize_result

from oracle import clamp, np_kl


# ---------------------------------------------------------------------------
# checkpoint / resume
# ---------------------------------------------------------------------------


def test_checkpoint_roundtrip(tmp_path, small_problem):
    x, w, h = small_problem
    state = ckpt.CheckpointState(
        w=clamp(w), h=clamp(h), iteration=42, cost_history=[3.0, 2.0], converged=False
    )
    step_dir = ckpt.save_checkpoint(tmp_path, state, SolveConfig())
    assert ckpt.latest_checkpoint(tmp_path) == step_dir
    back = ckpt.load_checkpoint(step_dir)
    np.testing.assert_array_equal(back.w, state.w)
    np.testing.assert_array_equal(back.h, state.h)
    assert back.iteration == 42
    assert back.cost_history == [3.0, 2.0]


def test_checkpointed_solve_matches_straight_run(tmp_path, small_problem):
    """Segmented solve == one-shot solve (bitwise: same op sequence)."""
    x, w, h = small_problem
    cfg = SolveConfig(max_iter=40, check_every=10)
    straight = solve(x, w, h, cfg)
    state = ckpt.solve_with_checkpoints(
        x, w, h, cfg, str(tmp_path / "ck"), every=10
    )
    assert state.iteration == 40
    np.testing.assert_array_equal(state.w, np.asarray(straight.w))
    np.testing.assert_array_equal(state.h, np.asarray(straight.h))
    hist = np.asarray(straight.cost_history)[: int(straight.num_checks)]
    np.testing.assert_allclose(state.cost_history, hist, rtol=1e-6)


def test_resume_continues_from_checkpoint(tmp_path, small_problem):
    x, w, h = small_problem
    cfg = SolveConfig(max_iter=40, check_every=10)
    d = str(tmp_path / "ck")
    # first run stops after 20 (simulate preemption by capping max_iter)
    import dataclasses

    ckpt.solve_with_checkpoints(x, w, h, dataclasses.replace(cfg, max_iter=20), d, every=10)
    assert "step_00000020" in ckpt.latest_checkpoint(d)
    # resume to 40
    state = ckpt.solve_with_checkpoints(x, w, h, cfg, d, every=10)
    assert state.iteration == 40
    straight = solve(x, w, h, cfg)
    np.testing.assert_array_equal(state.w, np.asarray(straight.w))
    assert len(state.cost_history) == 4


def test_resume_shape_mismatch_raises(tmp_path, small_problem):
    x, w, h = small_problem
    d = str(tmp_path / "ck")
    ckpt.solve_with_checkpoints(x, w, h, SolveConfig(max_iter=10), d, every=10)
    with pytest.raises(ValueError):
        ckpt.solve_with_checkpoints(
            x[:, :-2], w, h[:, :-2], SolveConfig(max_iter=20), d, every=10
        )


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


def test_checkpointed_solve_is_device_resident(tmp_path, small_problem, monkeypatch):
    """X is placed once and the SAME device buffer feeds every segment; each
    segment's W/H inputs are the previous segment's outputs (no host round
    trip of the carry)."""
    import jax

    import nmf_tpu.models.solver as solver_mod

    x, w, h = small_problem
    seen = []
    real_solve = solver_mod.solve

    def spy(x, w0, h0, *a, **k):
        seen.append((x, w0, h0, k))
        return real_solve(x, w0, h0, *a, **k)

    monkeypatch.setattr(solver_mod, "solve", spy)
    ckpt.solve_with_checkpoints(
        x, w, h, SolveConfig(max_iter=30), str(tmp_path / "ck"), every=10
    )
    assert len(seen) == 3
    x0 = seen[0][0]
    assert isinstance(x0, jax.Array)
    # one placement of X, reused by identity in every segment
    assert all(s[0] is x0 for s in seen)
    # segments run with clamping disabled (it happened once, up front)
    assert all(s[3].get("clamp_inputs") is False for s in seen)


def test_checkpointed_check_iterations_exact(tmp_path, small_problem):
    """Segments of 10 with check_every=25: one check per segment, labelled at
    the true global iterations 10/20/30 (not multiples of 25)."""
    x, w, h = small_problem
    state = ckpt.solve_with_checkpoints(
        x, w, h, SolveConfig(max_iter=30, check_every=25),
        str(tmp_path / "ck"), every=10,
    )
    assert state.check_iterations == [10, 20, 30]
    assert len(state.cost_history) == 3
    # labels survive the meta.json roundtrip
    loaded = ckpt.load_checkpoint(ckpt.latest_checkpoint(str(tmp_path / "ck")))
    assert loaded.check_iterations == [10, 20, 30]


def test_solve_donates_state_buffers_when_unclamped(small_problem):
    """clamp_inputs=False hands ownership of W/H to the solver (the segment
    driver's contract); the default path leaves caller arrays untouched."""
    import jax
    import jax.numpy as jnp

    x, w, h = small_problem
    cfg = SolveConfig(max_iter=3)
    ref = solve(x, w, h, cfg)

    eps = np.float32(cfg.eps)
    x_d = jnp.maximum(jnp.asarray(x), eps)
    w_d = jnp.maximum(jnp.asarray(w), eps)
    h_d = jnp.maximum(jnp.asarray(h), eps)
    res = solve(x_d, w_d, h_d, cfg, clamp_inputs=False)
    np.testing.assert_array_equal(np.asarray(res.w), np.asarray(ref.w))
    # the state buffers were donated (consumed); X was not
    assert w_d.is_deleted() and h_d.is_deleted()
    assert not x_d.is_deleted()

    # default clamp path: caller's device arrays stay valid
    w_d2 = jnp.asarray(w)
    h_d2 = jnp.asarray(h)
    solve(x, w_d2, h_d2, cfg)
    assert not w_d2.is_deleted() and not h_d2.is_deleted()


def test_metrics_report(tmp_path, small_problem, capsys):
    x, w, h = small_problem
    res = solve(x, w, h, SolveConfig(max_iter=30, check_every=10))
    jsonl = tmp_path / "m.jsonl"
    logger = MetricsLogger(verbose=False, jsonl_path=str(jsonl))
    rep = logger.report(res, x.shape, seconds=1.5)
    assert rep.iterations == 30
    assert len(rep.checks) == 3
    assert rep.checks[-1].cost == pytest.approx(float(res.cost))
    assert rep.checks[0].rel_change == float("inf")
    assert rep.checks[1].rel_change > 0
    rec = json.loads(jsonl.read_text().strip())
    assert rec["iterations"] == 30
    assert rec["iters_per_sec"] == pytest.approx(20.0)


def test_live_metrics_stream_during_solve(small_problem):
    """live_metrics streams one (iter, cost, rel) event per check, matching
    the recorded cost history."""
    import jax

    from nmf_tpu.utils import metrics as m

    x, w, h = small_problem
    events = []
    m.set_live_handler(lambda it, c, r: events.append((it, c, r)))
    try:
        res = solve(
            x, w, h, SolveConfig(max_iter=30, check_every=10, live_metrics=True)
        )
        jax.effects_barrier()  # flush async callbacks
    finally:
        m.set_live_handler(None)
    assert [e[0] for e in events] == [10, 20, 30]
    hist = np.asarray(res.cost_history)[: int(res.num_checks)]
    np.testing.assert_allclose([e[1] for e in events], hist, rtol=1e-6)
    assert not np.isfinite(events[0][2])  # no baseline at the first check
    assert events[1][2] > 0


def test_live_metrics_sharded_emits_once_per_check(small_problem):
    """On a mesh the live stream is gated to device (0,0): one line per
    check, not one per device."""
    import jax

    from nmf_tpu.parallel import make_mesh, solve_sharded
    from nmf_tpu.utils import metrics as m

    x, w, h = small_problem
    events = []
    m.set_live_handler(lambda it, c, r: events.append(it))
    try:
        solve_sharded(
            x, w, h,
            SolveConfig(max_iter=20, check_every=10, live_metrics=True),
            mesh=make_mesh(shape=(4, 2)),
        )
        jax.effects_barrier()
    finally:
        m.set_live_handler(None)
    assert events == [10, 20]


def test_live_metrics_chunked_fallback(small_problem, monkeypatch):
    """Platforms that reject in-jit host callbacks (some PJRT plugins) get
    the chunked host-driven live loop with identical results/metrics."""
    import nmf_tpu.models.solver as solver_mod
    from nmf_tpu.utils import metrics as m

    x, w, h = small_problem
    cfg = SolveConfig(max_iter=30, check_every=10, live_metrics=True)
    ref = solve(x, w, h, SolveConfig(max_iter=30, check_every=10))

    monkeypatch.setattr(
        solver_mod, "host_callbacks_supported", lambda p=None: False
    )
    events = []
    m.set_live_handler(lambda it, c, r: events.append((it, c)))
    try:
        res = solve(x, w, h, cfg)
    finally:
        m.set_live_handler(None)
    assert [e[0] for e in events] == [10, 20, 30]
    assert int(res.iterations) == 30
    # chunked path produces the SAME factors and history as the fused loop
    np.testing.assert_array_equal(np.asarray(res.w), np.asarray(ref.w))
    np.testing.assert_allclose(
        np.asarray(res.cost_history), np.asarray(ref.cost_history), rtol=1e-6
    )
    # early stop via thresh works host-side too
    events.clear()
    m.set_live_handler(lambda it, c, r: events.append(it))
    try:
        res2 = solve(
            x, w, h,
            SolveConfig(max_iter=2000, check_every=10, thresh=1e-3,
                        live_metrics=True),
        )
    finally:
        m.set_live_handler(None)
    assert bool(res2.converged)
    assert int(res2.iterations) < 2000
    assert len(events) == int(res2.num_checks)


def test_live_metrics_requires_cost():
    from nmf_tpu.models.solver import solve as _solve

    x = np.random.RandomState(0).rand(16, 16).astype(np.float32)
    w = np.random.RandomState(1).rand(16, 4).astype(np.float32)
    h = np.random.RandomState(2).rand(4, 16).astype(np.float32)
    with pytest.raises(ValueError, match="live_metrics"):
        _solve(
            x, w, h,
            SolveConfig(max_iter=5, track_cost=False, live_metrics=True),
        )


def test_metrics_check_labels_partial_final_chunk(small_problem):
    """80 iters at check_every=25 -> checks at 25/50/75/80, not 20/40/60/80."""
    x, w, h = small_problem
    res = solve(x, w, h, SolveConfig(max_iter=80, check_every=25))
    rep = summarize_result(res, x.shape, check_every=25)
    assert [c.iteration for c in rep.checks] == [25, 50, 75, 80]


# ---------------------------------------------------------------------------
# init strategies
# ---------------------------------------------------------------------------


def test_random_init_matches_reference_generator():
    w, h = init_mod.random_init(4096, 128, 350, seed=0)
    # matrix_export.py draws X first; draw X then compare W
    rng = np.random.RandomState(0)
    rng.rand(4096, 128)  # my W is the first draw with its own seed stream
    w2 = np.random.RandomState(0).rand(4096, 128).astype(np.float32)
    np.testing.assert_array_equal(w, w2)


@pytest.mark.parametrize("variant", ["nndsvd", "nndsvda", "nndsvdar"])
def test_nndsvd_properties(small_problem, variant):
    x, _, _ = small_problem
    k = 8
    w, h = init_mod.nndsvd_init(x, k, variant=variant)
    assert w.shape == (x.shape[0], k) and h.shape == (k, x.shape[1])
    assert w.min() >= 0 and h.min() >= 0
    if variant != "nndsvd":
        assert (w > 0).all() and (h > 0).all()  # dense variants


def test_nndsvda_beats_random_start(small_problem):
    x, _, _ = small_problem
    x = clamp(x)
    k = 8
    wr, hr = init_mod.random_init(x.shape[0], k, x.shape[1])
    wn, hn = init_mod.nndsvd_init(x, k, variant="nndsvda")
    assert np_kl(x, clamp(wn), clamp(hn)) < np_kl(x, clamp(wr), clamp(hr))


def test_nndsvd_rank_too_big(small_problem):
    x, _, _ = small_problem
    with pytest.raises(ValueError):
        init_mod.nndsvd_init(x, min(x.shape) + 1)


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


@pytest.fixture()
def cli_fixtures(tmp_path, small_problem):
    x, w, h = small_problem
    paths = {}
    for name, arr in zip("XWH", (x, w, h)):
        p = tmp_path / f"{name}.bin"
        binio.write_matrix(arr, p)
        paths[name] = str(p)
    return tmp_path, paths


def test_cli_run_with_files(cli_fixtures):
    tmp_path, p = cli_fixtures
    wout, hout = str(tmp_path / "Wo.bin"), str(tmp_path / "Ho.bin")
    rc = cli_main(
        ["run", p["X"], p["W"], p["H"], "-o", wout, hout, "--max-iter", "10", "-q"]
    )
    assert rc == 0
    w = binio.read_matrix(wout)
    ref = solve(
        binio.read_matrix(p["X"]),
        binio.read_matrix(p["W"]),
        binio.read_matrix(p["H"]),
        SolveConfig(max_iter=10),
    )
    np.testing.assert_array_equal(w, np.asarray(ref.w))


def test_cli_run_with_rank_init(cli_fixtures):
    tmp_path, p = cli_fixtures
    wout, hout = str(tmp_path / "Wr.bin"), str(tmp_path / "Hr.bin")
    rc = cli_main(
        ["run", p["X"], "-o", wout, hout, "--rank", "6", "--max-iter", "5", "-q"]
    )
    assert rc == 0
    assert binio.read_matrix(wout).shape == (96, 6)


def test_cli_run_missing_init_errors(cli_fixtures):
    _, p = cli_fixtures
    assert cli_main(["run", p["X"], "-q"]) == 2


def test_cli_gen_and_info(tmp_path, capsys):
    rc = cli_main(["gen", str(tmp_path / "fx")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "X.bin" in out
    rc = cli_main(["info", str(tmp_path / "fx" / "X.bin")])
    assert rc == 0
    assert "4096x350" in capsys.readouterr().out


def test_cli_checkpointed_run(cli_fixtures):
    tmp_path, p = cli_fixtures
    wout, hout = str(tmp_path / "Wc.bin"), str(tmp_path / "Hc.bin")
    ck = str(tmp_path / "ckpt")
    rc = cli_main(
        [
            "run", p["X"], p["W"], p["H"], "-o", wout, hout,
            "--max-iter", "20", "--checkpoint-dir", ck,
            "--checkpoint-every", "10", "-q",
        ]
    )
    assert rc == 0
    assert "step_00000020" in ckpt.latest_checkpoint(ck)


def test_cli_sharded_run(cli_fixtures):
    tmp_path, p = cli_fixtures
    # 96x130 problem: mesh 2x1 divides rows evenly (130 cols on 1 shard)
    wout, hout = str(tmp_path / "Ws.bin"), str(tmp_path / "Hs.bin")
    rc = cli_main(
        ["run", p["X"], p["W"], p["H"], "-o", wout, hout,
         "--max-iter", "10", "--mesh", "2x1", "-q"]
    )
    assert rc == 0
    ref = solve(
        binio.read_matrix(p["X"]),
        binio.read_matrix(p["W"]),
        binio.read_matrix(p["H"]),
        SolveConfig(max_iter=10),
    )
    np.testing.assert_allclose(
        binio.read_matrix(wout), np.asarray(ref.w), rtol=5e-5, atol=1e-7
    )


# ---------------------------------------------------------------------------
# numerical guards
# ---------------------------------------------------------------------------


def test_guards_accept_clean_input(small_problem):
    from nmf_tpu.utils import guards

    x, w, h = small_problem
    guards.validate_input("X", x)
    res = solve(x, w, h, SolveConfig(max_iter=5))
    guards.validate_result(res)


def test_guards_reject_negative_and_nan(small_problem):
    from nmf_tpu.utils import guards

    x, _, _ = small_problem
    bad = x.copy()
    bad[3, 5] = -1.0
    with pytest.raises(guards.GuardError, match="negative"):
        guards.validate_input("X", bad)
    bad[3, 5] = np.nan
    with pytest.raises(guards.GuardError, match="non-finite"):
        guards.validate_input("X", bad)


def test_cli_validate_flag_rejects_bad_input(cli_fixtures, capsys):
    tmp_path, p = cli_fixtures
    x = binio.read_matrix(p["X"])
    x[0, 0] = -5.0
    bad = str(tmp_path / "bad.bin")
    binio.write_matrix(x, bad)
    # GuardError is a ValueError: the CLI reports it as a clean one-line
    # error with a nonzero exit (not a traceback)
    rc = cli_main(["run", bad, p["W"], p["H"], "--max-iter", "1", "-q", "--validate"])
    assert rc == 2
    assert "negative" in capsys.readouterr().err.lower()


def test_checkpointed_thresh_matches_plain_solve(tmp_path, small_problem):
    """Review fix: convergence baseline carries across segment boundaries."""
    x, w, h = small_problem
    cfg = SolveConfig(max_iter=100_000, thresh=1e-3, check_every=10)
    plain = solve(x, w, h, cfg)
    state = ckpt.solve_with_checkpoints(x, w, h, cfg, str(tmp_path / "c"), every=10)
    assert state.converged
    assert state.iteration == int(plain.iterations)
    np.testing.assert_array_equal(state.w, np.asarray(plain.w))


def test_checkpoint_config_mismatch_refused(tmp_path, small_problem):
    """Review fix: resuming under a different objective is an error."""
    x, w, h = small_problem
    d = str(tmp_path / "c")
    ckpt.solve_with_checkpoints(x, w, h, SolveConfig(max_iter=10, beta=1.0), d, every=10)
    with pytest.raises(ValueError, match="refusing to mix"):
        ckpt.solve_with_checkpoints(
            x, w, h, SolveConfig(max_iter=20, beta=2.0), d, every=10
        )


def test_metrics_jsonl_is_strict_json(tmp_path, small_problem):
    """Review fix: JSONL must be RFC 8259 (no Infinity/NaN literals)."""
    x, w, h = small_problem
    res = solve(x, w, h, SolveConfig(max_iter=20, check_every=10))
    jsonl = tmp_path / "m.jsonl"
    MetricsLogger(verbose=False, jsonl_path=str(jsonl)).report(res, x.shape)
    line = jsonl.read_text().strip()
    assert "Infinity" not in line and "NaN" not in line
    rec = json.loads(line)
    assert rec["checks"][0]["rel_change"] is None  # first check: no baseline


def test_cli_batch_directory(tmp_path, rng):
    d = tmp_path / "specs"
    d.mkdir()
    for i in range(3):
        binio.write_matrix(rng.rand(40, 50).astype(np.float32), d / f"s{i}.bin")
    out = str(tmp_path / "out")
    rc = cli_main(
        ["batch", str(d), "--rank", "4", "--out-dir", out, "--max-iter", "10", "-q"]
    )
    assert rc == 0
    w0 = binio.read_matrix(os.path.join(out, "s0.W.bin"))
    h0 = binio.read_matrix(os.path.join(out, "s0.H.bin"))
    assert w0.shape == (40, 4) and h0.shape == (4, 50)
    assert np.all(np.isfinite(w0)) and w0.min() >= 0
    # factorization is meaningful: reconstruction correlates with the input
    x0 = binio.read_matrix(str(d / "s0.bin"))
    corr = np.corrcoef((w0 @ h0).ravel(), x0.ravel())[0, 1]
    assert corr > 0.2  # rank-4 of random 40x50 captures limited variance


def test_checkpointed_solve_int8_x(tmp_path, small_problem):
    """x_dtype='int8' in the checkpointed driver quantizes (never a raw
    astype-to-int8, which would zero the data) and matches the plain solver."""
    from nmf_tpu.utils.config import Precision

    x, w, h = small_problem
    cfg = SolveConfig(max_iter=20, check_every=10, precision=Precision(x_dtype="int8"))
    ref = solve(x, w, h, cfg)
    state = ckpt.solve_with_checkpoints(
        x, w, h, cfg, str(tmp_path / "ck"), every=10
    )
    assert state.iteration == 20
    np.testing.assert_allclose(
        np.asarray(state.w), np.asarray(ref.w), rtol=1e-5, atol=1e-7
    )
    # and the cost is sane (a raw int8 astype would zero X -> degenerate cost)
    ref32 = solve(x, w, h, SolveConfig(max_iter=20, check_every=10))
    assert abs(state.cost_history[-1] - float(ref32.cost)) / float(ref32.cost) < 0.01


def test_fingerprint_backcompat_missing_keys(tmp_path, small_problem):
    """Checkpoints written before a fingerprint field existed still resume
    under the same objective (missing key = compatible; differing = refused)."""
    import json

    x, w, h = small_problem
    cfg = SolveConfig(max_iter=10)
    state = ckpt.CheckpointState(
        w=clamp(w), h=clamp(h), iteration=5, cost_history=[1.0]
    )
    step_dir = ckpt.save_checkpoint(str(tmp_path), state, cfg)
    meta_path = os.path.join(step_dir, "meta.json")
    meta = json.load(open(meta_path))
    del meta["config"]["x_dtype"]  # simulate a pre-x_dtype-era checkpoint
    json.dump(meta, open(meta_path, "w"))
    back = ckpt.load_checkpoint(step_dir, cfg)  # must NOT raise
    assert back.iteration == 5
    # a field that IS present and differs still refuses
    import dataclasses

    with pytest.raises(ValueError, match="refusing"):
        ckpt.load_checkpoint(step_dir, dataclasses.replace(cfg, beta=2.0))


def test_cli_run_with_mask(cli_fixtures):
    """--mask routes through the masked solver (in-memory and out-of-core)."""
    from nmf_tpu.models.masked import solve_masked

    tmp_path, p = cli_fixtures
    x = binio.read_matrix(p["X"])
    rng = np.random.RandomState(5)
    mask = (rng.rand(*x.shape) > 0.3).astype(np.float32)
    mpath = str(tmp_path / "M.bin")
    binio.write_matrix(mask, mpath)
    wout, hout = str(tmp_path / "Wm.bin"), str(tmp_path / "Hm.bin")
    rc = cli_main(
        ["run", p["X"], p["W"], p["H"], "-o", wout, hout,
         "--mask", mpath, "--max-iter", "10", "-q"]
    )
    assert rc == 0
    ref = solve_masked(
        x, binio.read_matrix(p["W"]), binio.read_matrix(p["H"]), mask,
        SolveConfig(max_iter=10),
    )
    np.testing.assert_allclose(
        binio.read_matrix(wout), np.asarray(ref.w), rtol=1e-6, atol=1e-8
    )
    # streaming composition: mask streams alongside X
    rc = cli_main(
        ["run", p["X"], p["W"], p["H"], "-o", wout, hout,
         "--mask", mpath, "--out-of-core", "--block-n", "128",
         "--max-iter", "10", "-q"]
    )
    assert rc == 0
    np.testing.assert_allclose(
        binio.read_matrix(wout), np.asarray(ref.w), rtol=1e-4, atol=1e-7
    )
    # mask shape mismatch: clean error
    bad = str(tmp_path / "Mbad.bin")
    binio.write_matrix(mask[:-1], bad)
    assert cli_main(
        ["run", p["X"], p["W"], p["H"], "--mask", bad, "-q"]
    ) == 2
    # incompatible with strict-compat
    assert cli_main(
        ["run", p["X"], p["W"], p["H"], "--mask", mpath, "--strict-compat", "-q"]
    ) == 2


def test_cli_run_restarts(cli_fixtures):
    tmp_path, p = cli_fixtures
    wout, hout = str(tmp_path / "Wre.bin"), str(tmp_path / "Hre.bin")
    rc = cli_main(
        ["run", p["X"], "-o", wout, hout, "--rank", "6", "--restarts", "3",
         "--max-iter", "10", "--init", "random", "-q"]
    )
    assert rc == 0
    # the kept member is the argmin-cost restart
    from nmf_tpu import SolveConfig, solve_restarts

    x = binio.read_matrix(p["X"])
    sel = solve_restarts(
        x, rank=6, n_restarts=3, config=SolveConfig(max_iter=10),
        init="random", seed=0,
    )
    np.testing.assert_array_equal(
        binio.read_matrix(wout), np.asarray(sel.best[0])
    )


def test_cli_run_restarts_flag_conflicts(cli_fixtures):
    tmp_path, p = cli_fixtures
    # restarts need generated inits
    assert cli_main(["run", p["X"], p["W"], p["H"], "--restarts", "2", "-q"]) == 2
    # no strict / checkpoint / mask / out-of-core composition
    assert cli_main(
        ["run", p["X"], "--rank", "4", "--restarts", "2", "--strict-compat", "-q"]
    ) == 2
    assert cli_main(
        ["run", p["X"], "--rank", "4", "--restarts", "2", "--out-of-core", "-q"]
    ) == 2


def test_cli_transform(cli_fixtures):
    tmp_path, p = cli_fixtures
    hout = str(tmp_path / "Ht.bin")
    rc = cli_main(
        ["transform", p["X"], p["W"], "-o", hout, "--h0", p["H"],
         "--max-iter", "10", "-q"]
    )
    assert rc == 0
    from nmf_tpu import SolveConfig, solve_h_only

    ref = solve_h_only(
        binio.read_matrix(p["X"]), binio.read_matrix(p["W"]),
        binio.read_matrix(p["H"]), SolveConfig(max_iter=10),
    )
    np.testing.assert_array_equal(binio.read_matrix(hout), np.asarray(ref.h))


def test_cli_transform_out_of_core(cli_fixtures):
    tmp_path, p = cli_fixtures
    hout = str(tmp_path / "Hooc.bin")
    rc = cli_main(
        ["transform", p["X"], p["W"], "-o", hout, "--h0", p["H"],
         "--max-iter", "10", "--out-of-core", "--block-n", "64", "-q"]
    )
    assert rc == 0
    h = binio.read_matrix(hout)
    x = binio.read_matrix(p["X"])
    w = binio.read_matrix(p["W"])
    assert h.shape == (w.shape[1], x.shape[1])


def test_cli_run_online(cli_fixtures):
    tmp_path, p = cli_fixtures
    wout, hout = str(tmp_path / "Won.bin"), str(tmp_path / "Hon.bin")
    rc = cli_main(
        ["run", p["X"], "-o", wout, hout, "--rank", "6", "--online",
         "--init", "random", "--online-passes", "2", "--block-n", "64",
         "--max-iter", "20", "-q"]
    )
    assert rc == 0
    x = binio.read_matrix(p["X"])
    w = binio.read_matrix(wout)
    h = binio.read_matrix(hout)
    assert w.shape == (x.shape[0], 6) and h.shape == (6, x.shape[1])
    assert np.isfinite(w).all() and np.isfinite(h).all()
    # flag conflicts error cleanly
    assert cli_main(
        ["run", p["X"], "--rank", "6", "--online", "--out-of-core", "-q"]
    ) == 2
    assert cli_main(
        ["run", p["X"], p["W"], p["H"], "--online", "-q"]
    ) == 2
    # non-random generated inits need all of X; streamed X forbids them
    assert cli_main(["run", p["X"], "--rank", "6", "--online", "-q"]) == 2
    # bad hyper-parameters: one-line errors, not tracebacks
    assert cli_main(
        ["run", p["X"], "--rank", "6", "--online", "--init", "random",
         "--online-rho", "0", "-q"]
    ) == 2
    assert cli_main(
        ["run", p["X"], "--rank", "6", "--online", "--init", "random",
         "--online-passes", "0", "-q"]
    ) == 2


def test_cli_run_online_mesh(cli_fixtures):
    tmp_path, p = cli_fixtures
    wout, hout = str(tmp_path / "Wom.bin"), str(tmp_path / "Hom.bin")
    # small_problem is 96x130: mesh 2x1 divides it; block 26 divides cols
    rc = cli_main(
        ["run", p["X"], "-o", wout, hout, "--rank", "6", "--online",
         "--init", "random", "--mesh", "2x1", "--block-n", "26",
         "--max-iter", "10", "-q"]
    )
    assert rc == 0
    assert binio.read_matrix(wout).shape[1] == 6


def test_cli_run_freeze(cli_fixtures):
    tmp_path, p = cli_fixtures
    wout, hout = str(tmp_path / "Wf.bin"), str(tmp_path / "Hf.bin")
    rc = cli_main(
        ["run", p["X"], p["W"], p["H"], "-o", wout, hout, "--freeze", "3",
         "--max-iter", "10", "-q"]
    )
    assert rc == 0
    w_in = binio.read_matrix(p["W"])
    w_out = binio.read_matrix(wout)
    eps = np.float32(2.2204e-16)
    np.testing.assert_array_equal(w_out[:, :3], np.maximum(w_in[:, :3], eps))
    assert not np.allclose(w_out[:, 3:], np.maximum(w_in[:, 3:], eps))
    # conflicts
    assert cli_main(
        ["run", p["X"], p["W"], p["H"], "--freeze", "2", "--strict-compat", "-q"]
    ) == 2
    assert cli_main(
        ["run", p["X"], "--rank", "4", "--restarts", "2", "--freeze", "1", "-q"]
    ) == 2


def test_cli_freeze_value_errors_are_clean(cli_fixtures, capsys):
    _, p = cli_fixtures
    # out-of-range freeze: one-line error, not a traceback
    rc = cli_main(
        ["run", p["X"], p["W"], p["H"], "--freeze", "999", "-q"]
    )
    assert rc == 2
    assert "n_frozen" in capsys.readouterr().err
    # --online rejects --freeze explicitly
    assert cli_main(
        ["run", p["X"], "--rank", "4", "--online", "--init", "random",
         "--freeze", "2", "-q"]
    ) == 2


@pytest.mark.parametrize("kind", ["beta2", "hals", "reg"])
def test_checkpointed_solve_families(tmp_path, small_problem, kind):
    """Checkpoint/resume is family-agnostic: an interrupted beta / HALS /
    penalized run resumes to the same factors as a straight run."""
    x, w, h = small_problem
    if kind == "beta2":
        cfg = SolveConfig(max_iter=20, check_every=10, beta=2.0)
    elif kind == "hals":
        cfg = SolveConfig(max_iter=20, check_every=10, beta=2.0, algorithm="hals")
    else:
        cfg = SolveConfig(max_iter=20, check_every=10, l1_h=0.02)
    from nmf_tpu.models.solver import solve as _solve

    ref = _solve(x, w, h, cfg)
    d = str(tmp_path / f"ck_{kind}")
    import dataclasses

    ckpt.solve_with_checkpoints(
        x, w, h, dataclasses.replace(cfg, max_iter=10), d, every=10
    )
    state = ckpt.solve_with_checkpoints(x, w, h, cfg, d, every=10)
    assert state.iteration == 20
    np.testing.assert_allclose(
        np.asarray(state.w), np.asarray(ref.w), rtol=5e-5, atol=1e-7
    )


def test_cli_transform_masked(cli_fixtures):
    tmp_path, p = cli_fixtures
    x = binio.read_matrix(p["X"])
    rng = np.random.RandomState(7)
    mask = (rng.rand(*x.shape) > 0.3).astype(np.float32)
    mpath = str(tmp_path / "mask.bin")
    binio.write_matrix(mask, mpath)
    hout = str(tmp_path / "Hm.bin")
    rc = cli_main(
        ["transform", p["X"], p["W"], "-o", hout, "--h0", p["H"],
         "--mask", mpath, "--max-iter", "10", "-q"]
    )
    assert rc == 0
    from nmf_tpu import SolveConfig, solve_masked_h_only

    ref = solve_masked_h_only(
        x, binio.read_matrix(p["W"]), binio.read_matrix(p["H"]), mask,
        SolveConfig(max_iter=10),
    )
    np.testing.assert_array_equal(binio.read_matrix(hout), np.asarray(ref.h))
    assert cli_main(
        ["transform", p["X"], p["W"], "--mask", mpath, "--out-of-core", "-q"]
    ) == 2


def test_live_chunked_tail_warm(small_problem, monkeypatch):
    """max_iter not a multiple of check_every: the tail-sized program is
    warmed UP FRONT (compile latency where the user expects it, not a
    surprise stall before the final check) with copied inputs — results
    must equal the non-live solve exactly."""
    import nmf_tpu.models.solver as solver_mod
    from nmf_tpu.utils import metrics as m

    x, w, h = small_problem
    ref = solve(x, w, h, SolveConfig(max_iter=25, check_every=10))
    monkeypatch.setattr(
        solver_mod, "host_callbacks_supported", lambda p=None: False
    )
    events = []
    m.set_live_handler(lambda it, c, r: events.append(it))
    try:
        res = solve(
            x, w, h,
            SolveConfig(max_iter=25, check_every=10, live_metrics=True),
        )
    finally:
        m.set_live_handler(None)
    assert events == [10, 20, 25]
    assert int(res.iterations) == 25
    np.testing.assert_array_equal(np.asarray(res.w), np.asarray(ref.w))
    np.testing.assert_array_equal(np.asarray(res.h), np.asarray(ref.h))


def test_live_chunked_threads_prev_cost(small_problem):
    """Each chunked-live segment receives the PREVIOUS check's cost as its
    initial_cost (not NaN) and the previous segment's final momentum as its
    initial_momentum: an accelerated segment's acceptance baseline AND its
    adapted coefficient carry across chunks."""
    import jax.numpy as jnp

    from nmf_tpu.models.solver import SolveResult, run_live_chunked

    x, w, h = small_problem
    seen, seen_mom = [], []

    def make_fn(cfg):
        def fn(x_, w_, h_, c0, m0):
            seen.append(float(c0))
            seen_mom.append(float(m0))
            cost = 100.0 - 10.0 * len(seen)
            return SolveResult(
                w=w_, h=h_,
                iterations=jnp.asarray(cfg.max_iter, jnp.int32),
                cost=jnp.asarray(cost, jnp.float32),
                cost_history=jnp.asarray([cost], jnp.float32),
                num_checks=jnp.asarray(1, jnp.int32),
                converged=jnp.asarray(False, jnp.bool_),
                momentum=jnp.asarray(0.5 + 0.1 * len(seen), jnp.float32),
            )

        return fn

    res = run_live_chunked(
        make_fn, x, w, h,
        SolveConfig(max_iter=30, check_every=10),
        jnp.asarray(np.nan, jnp.float32),
    )
    assert np.isnan(seen[0])
    assert seen[1:] == [90.0, 80.0]
    assert np.isnan(seen_mom[0])
    # prior segment's final momentum (f32 round trip)
    np.testing.assert_allclose(seen_mom[1:], [0.6, 0.7], rtol=1e-6)
    assert float(res.cost) == 70.0
    np.testing.assert_allclose(float(res.momentum), 0.8, rtol=1e-6)
    assert int(res.num_checks) == 3


def test_cli_lone_init_file_errors(cli_fixtures, capsys):
    """run with W but no H (plus --rank) must error, not silently ignore
    the user's template file; same for the out-of-core entry."""
    _, p = cli_fixtures
    assert cli_main(["run", p["X"], p["W"], "--rank", "6", "-q"]) == 2
    assert "BOTH" in capsys.readouterr().err
    assert cli_main([
        "run", p["X"], p["W"], "--rank", "6", "--out-of-core", "-q",
    ]) == 2


def test_cli_bad_mesh_spec_errors(cli_fixtures, capsys):
    _, p = cli_fixtures
    assert cli_main([
        "run", p["X"], p["W"], p["H"], "--mesh", "8", "-q",
    ]) == 2
    assert "ROWSxCOLS" in capsys.readouterr().err


def test_cli_missing_file_is_clean_error(tmp_path, capsys):
    rc = cli_main(["run", str(tmp_path / "nope.bin"), "--rank", "4", "-q"])
    assert rc == 2
    err = capsys.readouterr().err
    assert "error: file not found" in err


def test_cli_info_foreign_zip(tmp_path, capsys):
    """info on an arbitrary zip (e.g. .npz) reports cleanly, no KeyError."""
    import numpy as _np

    p = str(tmp_path / "data.npz")
    _np.savez(p, a=_np.ones(3))
    assert cli_main(["info", p]) == 0
    assert "not an nmf_tpu serving artifact" in capsys.readouterr().out


def test_cli_batch_rejects_inapplicable_flags(tmp_path, rng, capsys):
    d = tmp_path / "mats"
    d.mkdir()
    binio.write_matrix(rng.rand(8, 8).astype(np.float32), d / "a.bin")
    assert cli_main([
        "batch", str(d), "-k", "2", "--out-of-core", "-q",
    ]) == 2
    assert "--out-of-core" in capsys.readouterr().err


def test_cli_separate_rejects_inapplicable_flags(tmp_path, capsys):
    assert cli_main([
        "separate", str(tmp_path / "a.wav"), "--rank", "4",
        "--checkpoint-dir", str(tmp_path), "-q",
    ]) == 2
    assert "--checkpoint-dir" in capsys.readouterr().err


def test_checkpoint_fingerprint_quant_and_accel(tmp_path, small_problem):
    """x_quant_rows changes the quantized objective and accelerate changes
    the trajectory — both must refuse a mismatched resume."""
    from nmf_tpu.utils.config import Precision

    x, w, h = small_problem
    cfg = SolveConfig(
        max_iter=10, precision=Precision(x_dtype="int8", x_quant_rows=0)
    )
    state = ckpt.CheckpointState(
        w=clamp(w), h=clamp(h), iteration=10, cost_history=[1.0]
    )
    step = ckpt.save_checkpoint(tmp_path, state, cfg)
    other = SolveConfig(
        max_iter=10, precision=Precision(x_dtype="int8", x_quant_rows=64)
    )
    with pytest.raises(ValueError, match="refusing"):
        ckpt.load_checkpoint(step, other)
    with pytest.raises(ValueError, match="refusing"):
        ckpt.load_checkpoint(
            step, SolveConfig(max_iter=10,
                              precision=Precision(x_dtype="int8"),
                              accelerate=True)
        )
    ckpt.load_checkpoint(step, cfg)  # same config resumes


def test_latest_checkpoint_ignores_crash_leftovers(tmp_path, small_problem):
    """A directory left by a crashed rename dance must never shadow the real
    step (a 'step_NNNN.old' name would sort after 'step_NNNN')."""
    import json as _json
    import os as _os

    x, w, h = small_problem
    state = ckpt.CheckpointState(
        w=clamp(w), h=clamp(h), iteration=100, cost_history=[1.0]
    )
    step = ckpt.save_checkpoint(tmp_path, state, SolveConfig())
    # simulate the worst-case leftover: a complete-looking dir whose name
    # sorts after the real step
    bad = _os.path.join(str(tmp_path), "step_00000100.old")
    _os.makedirs(bad)
    with open(_os.path.join(bad, "meta.json"), "w") as f:
        _json.dump({"iteration": 100}, f)
    assert ckpt.latest_checkpoint(str(tmp_path)) == step
    # overwriting the same step still works (rename dance)
    step2 = ckpt.save_checkpoint(tmp_path, state, SolveConfig())
    assert step2 == step
    assert ckpt.latest_checkpoint(str(tmp_path)) == step


def test_restarts_with_templates_raises(small_problem):
    """n_restarts > 1 cannot honor explicit w0/h0 templates — loud error,
    not a silent single solve."""
    from nmf_tpu.models.nmf import NMF

    x, w, h = small_problem
    est = NMF(n_components=w.shape[1], n_restarts=4, max_iter=5)
    with pytest.raises(ValueError, match="n_restarts"):
        est.fit(np.asarray(x), w0=np.asarray(w))


def test_masked_h_only_jit_is_cached():
    """The masked H-only builder must return the SAME compiled callable for
    equal configs — the streamed masked transform requests it once per
    column block (a retrace is a remote compile on the TPU platform)."""
    from nmf_tpu.models.masked import _masked_h_only_jit

    cfg = SolveConfig(max_iter=7, check_every=7)
    assert _masked_h_only_jit(cfg) is _masked_h_only_jit(cfg)


def test_validate_input_accepts_bfloat16():
    import ml_dtypes

    from nmf_tpu.utils.guards import GuardError, validate_input

    a = np.asarray([[1.0, 2.0]], dtype=ml_dtypes.bfloat16)
    validate_input("X", a)  # bf16 is a first-class storage dtype
    bad = np.asarray([[1.0, -2.0]], dtype=ml_dtypes.bfloat16)
    with pytest.raises(GuardError, match="negative"):
        validate_input("X", bad)


def test_summarize_result_zero_cost():
    """An exact fit (cost 0.0) must not crash the report with
    ZeroDivisionError."""
    import jax.numpy as jnp

    from nmf_tpu.models.solver import SolveResult
    from nmf_tpu.utils.metrics import summarize_result

    res = SolveResult(
        w=jnp.ones((4, 2)), h=jnp.ones((2, 4)),
        iterations=jnp.asarray(10, jnp.int32),
        cost=jnp.asarray(0.0, jnp.float32),
        cost_history=jnp.asarray([1.0, 0.0], jnp.float32),
        num_checks=jnp.asarray(2, jnp.int32),
        converged=jnp.asarray(False, jnp.bool_),
    )
    rep = summarize_result(res, (4, 4), seconds=0.0, check_every=5)
    assert rep.checks[-1].cost == 0.0
    assert rep.checks[-1].rel_change == float("inf")
    assert rep.seconds == 0.0  # a measured 0.0 is a value, not "missing"


def test_cli_select_sweep(cli_fixtures, capsys):
    """select: per-rank best-cost table from one batched sweep."""
    tmp_path, p = cli_fixtures
    jl = str(tmp_path / "sel.jsonl")
    rc = cli_main([
        "select", p["X"], "--ranks", "2,4", "--max-iter", "10",
        "--jsonl", jl,
    ])
    assert rc == 0
    err = capsys.readouterr().err
    assert "best cost" in err and "--stability" in err
    rec = json.loads(open(jl).read().strip())
    assert rec["ranks"] == [2, 4]
    assert set(rec["best_cost_per_rank"]) == {"2", "4"}
    # more rank never hurts the best divergence
    assert rec["best_cost_per_rank"]["4"] <= rec["best_cost_per_rank"]["2"] * 1.001
    assert rec["recommended_rank"] is None


def test_cli_select_stability_writes_best(cli_fixtures, capsys):
    """select --stability: cophenetic table, Brunet recommendation, and the
    recommended rank's best factors written to .bin."""
    tmp_path, p = cli_fixtures
    wout, hout = str(tmp_path / "Wb.bin"), str(tmp_path / "Hb.bin")
    rc = cli_main([
        "select", p["X"], "--ranks", "2,3", "--stability", "--restarts", "3",
        "--max-iter", "8", "-o", wout, hout, "-q",
    ])
    assert rc == 0
    w = binio.read_matrix(wout)
    h = binio.read_matrix(hout)
    assert w.shape[1] == h.shape[0] and w.shape[1] in (2, 3)
    assert np.isfinite(w).all() and np.isfinite(h).all()


def test_cli_select_error_paths(cli_fixtures, capsys):
    tmp_path, p = cli_fixtures
    # -o with several ranks and no recommendation
    rc = cli_main([
        "select", p["X"], "--ranks", "2,4", "--max-iter", "5",
        "-o", str(tmp_path / "W.bin"), str(tmp_path / "H.bin"), "-q",
    ])
    assert rc == 2
    assert "-o needs one rank" in capsys.readouterr().err
    # malformed ranks
    assert cli_main(["select", p["X"], "--ranks", "0", "-q"]) == 2
    assert "--ranks" in capsys.readouterr().err
    # inapplicable flags are rejected loudly
    assert cli_main([
        "select", p["X"], "--ranks", "2", "--out-of-core", "-q",
    ]) == 2
    assert "not supported" in capsys.readouterr().err


def test_cli_select_range_spec(cli_fixtures):
    from nmf_tpu.cli import _parse_ranks

    assert _parse_ranks("4:12:4") == [4, 8, 12]
    assert _parse_ranks("3:5") == [3, 4, 5]
    assert _parse_ranks("8,4,4") == [4, 8]
    with pytest.raises(ValueError):
        _parse_ranks("4:")

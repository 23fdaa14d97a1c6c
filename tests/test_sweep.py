"""First-party sweeper tests: param grammar, TPE convergence, study runner."""

import numpy as np
import pytest

from stain2stain_tpu.config import Config
from stain2stain_tpu.sweep import ParamSpace, Sweeper, TPESampler, parse_param, run_study


def test_param_grammar():
    p = parse_param("interval(0.0001, 0.1)")
    assert p.kind == "float" and p.lo == pytest.approx(1e-4) and p.hi == pytest.approx(0.1)
    c = parse_param("choice(32, 64, 128, 256)")
    assert c.kind == "choice" and c.choices == (32, 64, 128, 256)
    r = parse_param("range(0, 10, 2)")
    assert r.choices == (0, 2, 4, 6, 8)
    i = parse_param("int(interval(1, 9))")
    assert i.kind == "int"
    s = parse_param("choice(adam, sgd)")
    assert s.choices == ("adam", "sgd")
    with pytest.raises(ValueError):
        parse_param("gaussian(0, 1)")


def test_tpe_beats_random_on_quadratic():
    spaces = {"x": ParamSpace("float", lo=-5.0, hi=5.0)}

    def best_after(sampler, n):
        history = []
        for _ in range(n):
            a = sampler.suggest(spaces, history, "minimize")
            history.append((a, (a["x"] - 2.0) ** 2))
        return min(v for _, v in history)

    tpe = best_after(TPESampler(seed=0, n_startup_trials=8), 40)
    # pure random = a TPE that never leaves startup
    rand = best_after(TPESampler(seed=0, n_startup_trials=1000), 40)
    assert tpe <= rand + 1e-9


def test_sweeper_optimize_categorical_and_float():
    sweeper = Sweeper(
        direction="maximize",
        n_trials=25,
        sampler=TPESampler(seed=3, n_startup_trials=8),
        params={"lr": "interval(0.001, 1.0)", "width": "choice(16, 32, 64)"},
    )
    best_val, best_params = sweeper.optimize(
        lambda a: -abs(a["lr"] - 0.1) + (0.5 if a["width"] == 64 else 0.0)
    )
    assert best_params["width"] == 64
    assert abs(best_params["lr"] - 0.1) < 0.4


def test_sweeper_survives_failing_trials():
    calls = {"n": 0}

    def objective(a):
        calls["n"] += 1
        if calls["n"] % 2:
            raise RuntimeError("boom")
        return a["x"]

    sweeper = Sweeper(
        direction="maximize", n_trials=10,
        sampler=TPESampler(seed=1, n_startup_trials=4),
        params={"x": "interval(0, 1)"},
    )
    best_val, best_params = sweeper.optimize(objective)
    assert np.isfinite(best_val) and 0 <= best_val <= 1


def test_run_study_applies_overrides():
    cfg = Config(
        {
            "optimized_metric": "score",
            "sweeper": {
                "_target_": "stain2stain_tpu.sweep.Sweeper",
                "direction": "maximize",
                "n_trials": 6,
                "sampler": {
                    "_target_": "stain2stain_tpu.sweep.TPESampler",
                    "seed": 0,
                    "n_startup_trials": 3,
                },
                "params": {"model.lr": "interval(0, 1)"},
            },
            "model": {"lr": 0.5},
        }
    )

    seen = []

    def task(trial_cfg):
        lr = trial_cfg["model"]["lr"]
        seen.append(lr)
        return {"score": 1.0 - abs(lr - 0.3)}

    best = run_study(cfg, task)
    assert len(seen) == 6
    assert best == pytest.approx(max(1.0 - abs(v - 0.3) for v in seen))


def test_sweeper_storage_resume(tmp_path):
    from stain2stain_tpu.sweep import Sweeper, TPESampler

    journal = tmp_path / "study.jsonl"
    calls = []

    def objective(a):
        calls.append(a["x"])
        if len(calls) == 3:
            raise KeyboardInterrupt  # simulate an interrupted sweep
        return (a["x"] - 0.25) ** 2

    sw = Sweeper(
        direction="minimize", n_trials=6, storage=str(journal),
        sampler=TPESampler(seed=0, n_startup_trials=2), params={"x": "interval(0, 1)"},
    )
    with pytest.raises(KeyboardInterrupt):
        sw.optimize(objective)
    assert len(calls) == 3
    recorded = journal.read_text().strip().splitlines()
    assert len(recorded) == 2  # two completed before the interrupt

    # relaunch with the same storage: resumes, only runs the remaining trials
    calls2 = []

    def objective2(a):
        calls2.append(a["x"])
        return (a["x"] - 0.25) ** 2

    sw2 = Sweeper(
        direction="minimize", n_trials=6, storage=str(journal),
        sampler=TPESampler(seed=1, n_startup_trials=2), params={"x": "interval(0, 1)"},
    )
    best_val, best_params = sw2.optimize(objective2)
    assert len(calls2) == 4  # 6 total - 2 recorded
    assert len(journal.read_text().strip().splitlines()) == 6
    all_vals = [(v - 0.25) ** 2 for v in calls[:2] + calls2]
    assert best_val == pytest.approx(min(all_vals))


def test_sweeper_storage_accepts_rdb_url(tmp_path):
    from stain2stain_tpu.sweep import Sweeper

    sw = Sweeper(storage=f"sqlite:///{tmp_path}/study.db")
    assert str(sw._journal_path()).endswith("study.db.jsonl")


def test_sweeper_n_jobs_runs_concurrently(tmp_path):
    import threading

    from stain2stain_tpu.sweep import Sweeper, TPESampler

    active, peak, lock = [0], [0], threading.Lock()
    barrier = threading.Barrier(3, timeout=30)

    def objective(a):
        with lock:
            active[0] += 1
            peak[0] = max(peak[0], active[0])
        barrier.wait()  # all 3 trials of a batch must be in flight together
        with lock:
            active[0] -= 1
        return a["x"]

    sw = Sweeper(
        direction="minimize", n_trials=6, n_jobs=3,
        sampler=TPESampler(seed=0, n_startup_trials=10), params={"x": "interval(0, 1)"},
    )
    best_val, _ = sw.optimize(objective)
    assert peak[0] == 3
    assert np.isfinite(best_val)


def test_batch_proposals_diversify_via_constant_liar():
    """Past the TPE startup phase, a concurrent batch must not collapse to
    near-identical proposals: in-flight assignments enter the sampler's
    history with a constant-liar value, pushing later proposals elsewhere."""
    from stain2stain_tpu.sweep import Sweeper, TPESampler

    seen_batches: list[list[float]] = []
    import threading

    lock = threading.Lock()
    batch_accum: list[float] = []

    def objective(a):
        with lock:
            batch_accum.append(a["x"])
            if len(batch_accum) == 4:
                seen_batches.append(sorted(batch_accum))
                batch_accum.clear()
        return (a["x"] - 0.3) ** 2

    sw = Sweeper(
        direction="minimize", n_trials=24, n_jobs=4,
        sampler=TPESampler(seed=0, n_startup_trials=8),
        params={"x": "interval(0, 1)"},
    )
    sw.optimize(objective)
    # batches after startup: max pairwise spread within each batch stays
    # non-degenerate (identical proposals would make the spread ~0)
    post = seen_batches[2:]
    assert post, "expected post-startup batches"
    spreads = [max(b) - min(b) for b in post]
    assert max(spreads) > 1e-3

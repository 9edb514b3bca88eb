"""Native hyper-parameter-optimization engine (Optuna-compatible subset).

The reference delegates HPO to Optuna with SQLite storage
(``train_opt.py:282-294``). Optuna is not a baked dependency of this image,
so the framework ships its own engine with the same working surface:

* ``create_study(study_name, storage, load_if_exists, direction)`` —
  SQLite-backed (``sqlite:///...`` URLs), resumable across interruptions,
* ``Trial.suggest_int(name, lo, hi, step)`` / ``suggest_loguniform`` /
  ``suggest_uniform`` / ``suggest_categorical``,
* trial ``user_attrs`` (init seeds, device ids, weight snapshots),
* ``study.optimize(objective, n_trials, callbacks=...)``,
  ``study.best_trial`` / ``best_params``.

Sampler: independent Tree-structured Parzen Estimator per parameter —
after ``n_startup_trials`` random draws, observations split at the γ-quantile
into good/bad sets; candidates are drawn from the good-set kernel density and
scored by the density ratio l(x)/g(x). Matches Optuna's default univariate
TPE behavior closely enough to reproduce the reference search dynamics.
"""
from __future__ import annotations

import datetime
import json
import math
import os
import sqlite3
import threading
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional

import numpy as np

__all__ = ["Trial", "Study", "create_study", "TPESampler"]


# ---------------------------------------------------------------------------
# distributions
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class _IntDist:
    low: int
    high: int
    step: int = 1

    def grid(self):
        return np.arange(self.low, self.high + 1, self.step)


@dataclass(frozen=True)
class _FloatDist:
    low: float
    high: float
    log: bool = False


@dataclass(frozen=True)
class _CatDist:
    choices: tuple


# ---------------------------------------------------------------------------
# sampler
# ---------------------------------------------------------------------------


class TPESampler:
    def __init__(self, n_startup_trials: int = 10, n_candidates: int = 24,
                 gamma: float = 0.25, seed: int = 0):
        self.n_startup_trials = n_startup_trials
        self.n_candidates = n_candidates
        self.gamma = gamma
        self.rng = np.random.default_rng(seed)
        # np.random.Generator is NOT thread-safe; Study.optimize(n_jobs>1)
        # calls sample() from concurrent trial threads (the reference keeps
        # per-trial RNG isolated via fork_rng, train_opt.py:236-239 — this is
        # the equivalent care for the shared sampler state). RLock because
        # sample() falls through to _random() during startup.
        self._rng_lock = threading.RLock()

    # --- random draws ---
    def _random(self, dist):
        with self._rng_lock:
            return self._random_locked(dist)

    def _random_locked(self, dist):
        if isinstance(dist, _IntDist):
            return int(self.rng.choice(dist.grid()))
        if isinstance(dist, _FloatDist):
            if dist.log:
                # exp(log(high)) can land 1 ULP outside the bound — clamp
                # back to the domain (optuna clips float suggestions too)
                v = float(np.exp(self.rng.uniform(np.log(dist.low),
                                                  np.log(dist.high))))
                return min(max(v, dist.low), dist.high)
            return float(self.rng.uniform(dist.low, dist.high))
        if isinstance(dist, _CatDist):
            return dist.choices[int(self.rng.integers(len(dist.choices)))]
        raise TypeError(dist)

    # --- TPE ---
    def sample(self, dist, history: List[tuple]):
        """history: [(value_of_param, objective_value), ...] completed only."""
        with self._rng_lock:
            return self._sample_locked(dist, history)

    def _sample_locked(self, dist, history: List[tuple]):
        obs = [(x, y) for x, y in history if y is not None and np.isfinite(y)]
        if len(obs) < self.n_startup_trials:
            return self._random(dist)
        obs.sort(key=lambda t: t[1])
        n_good = max(1, int(math.ceil(self.gamma * len(obs))))
        if isinstance(dist, _CatDist):
            # weighted categorical by good-set VALUE counts (+1 smoothing);
            # before the float casts so string choices work, and matched
            # against the choice values so non-0..n-1 numeric choices count
            good_vals = [t[0] for t in obs[:n_good]]
            weights = np.array(
                [1.0 + sum(1 for v in good_vals if v == c) for c in dist.choices]
            )
            return dist.choices[int(self.rng.choice(len(dist.choices),
                                                    p=weights / weights.sum()))]
        good = np.asarray([t[0] for t in obs[:n_good]], dtype=float)
        bad = np.asarray([t[0] for t in obs[n_good:]], dtype=float)

        to_space = (lambda v: np.log(v)) if (
            isinstance(dist, _FloatDist) and dist.log) else (lambda v: v)
        from_space = (lambda v: np.exp(v)) if (
            isinstance(dist, _FloatDist) and dist.log) else (lambda v: v)
        lo, hi = to_space(dist.low), to_space(dist.high)
        g = to_space(good)
        b = to_space(bad) if len(bad) else np.asarray([0.5 * (lo + hi)])

        bw = max((hi - lo) / 10.0, 1e-12)

        def kde(x, centers):
            d = (x[:, None] - centers[None, :]) / bw
            return np.mean(np.exp(-0.5 * d * d), axis=1) + 1e-12

        # candidates from the good KDE
        centers = g[self.rng.integers(0, len(g), self.n_candidates)]
        cands = np.clip(centers + self.rng.normal(0, bw, self.n_candidates), lo, hi)
        score = kde(cands, g) / kde(cands, b)
        best = cands[int(np.argmax(score))]
        val = from_space(best)
        if isinstance(dist, _IntDist):
            grid = dist.grid()
            val = int(grid[np.argmin(np.abs(grid - val))])
            return val
        # exp(clip(·, log(high))) can exceed high by 1 ULP — clamp to domain
        return min(max(float(val), dist.low), dist.high)


# ---------------------------------------------------------------------------
# trial / study
# ---------------------------------------------------------------------------


class Trial:
    def __init__(self, study: "Study", number: int):
        self.study = study
        self.number = number
        self.params: Dict[str, Any] = {}
        self.user_attrs: Dict[str, Any] = {}
        self.value: Optional[float] = None
        self.datetime_complete: Optional[datetime.datetime] = None

    # --- suggest API ---
    def _suggest(self, name, dist):
        history = self.study._param_history(name)
        val = self.study.sampler.sample(dist, history)
        self.params[name] = val
        return val

    def suggest_int(self, name, low, high, step: int = 1):
        return self._suggest(name, _IntDist(low, high, step))

    def suggest_loguniform(self, name, low, high):
        return self._suggest(name, _FloatDist(low, high, log=True))

    def suggest_float(self, name, low, high, log: bool = False):
        return self._suggest(name, _FloatDist(low, high, log=log))

    suggest_uniform = suggest_float

    def suggest_categorical(self, name, choices):
        return self._suggest(name, _CatDist(tuple(choices)))

    def set_user_attr(self, key, value):
        self.user_attrs[key] = value


class Study:
    def __init__(self, study_name: str, storage: Optional[str] = None,
                 direction: str = "minimize", sampler: Optional[TPESampler] = None):
        assert direction in ("minimize", "maximize")
        self.study_name = study_name
        self.direction = direction
        self.sampler = sampler or TPESampler()
        self.trials: List[Trial] = []
        self._lock = threading.Lock()
        self._db_path = None
        if storage:
            assert storage.startswith("sqlite:///"), "only sqlite:/// storage supported"
            self._db_path = storage[len("sqlite:///"):]
            self._init_db()
            self._load()

    # --- storage ---
    def _conn(self):
        return sqlite3.connect(self._db_path, timeout=30)

    def _init_db(self):
        with self._conn() as c:
            c.execute(
                """CREATE TABLE IF NOT EXISTS trials (
                    study TEXT, number INTEGER, value REAL,
                    params TEXT, user_attrs TEXT, completed TEXT,
                    PRIMARY KEY (study, number))"""
            )

    def _load(self):
        with self._conn() as c:
            rows = c.execute(
                "SELECT number, value, params, user_attrs, completed FROM trials "
                "WHERE study=? ORDER BY number", (self.study_name,)
            ).fetchall()
        for number, value, params, attrs, completed in rows:
            t = Trial(self, number)
            t.value = value
            t.params = json.loads(params)
            t.user_attrs = json.loads(attrs)
            if completed:
                t.datetime_complete = datetime.datetime.fromisoformat(completed)
            self.trials.append(t)
        if rows:
            print(f"[hpo] resumed study {self.study_name!r} with {len(rows)} trials")

    def _persist(self, t: Trial):
        if not self._db_path:
            return
        with self._conn() as c:
            c.execute(
                "INSERT OR REPLACE INTO trials VALUES (?,?,?,?,?,?)",
                (
                    self.study_name, t.number, t.value,
                    json.dumps(t.params), json.dumps(t.user_attrs, default=str),
                    t.datetime_complete.isoformat() if t.datetime_complete else None,
                ),
            )

    # --- sampling helpers ---
    def _param_history(self, name):
        sign = 1.0 if self.direction == "minimize" else -1.0
        # snapshot under the study lock: concurrent trial threads append to
        # self.trials and flip t.value mid-iteration under n_jobs>1
        with self._lock:
            trials = list(self.trials)
        return [
            (t.params[name], sign * t.value)
            for t in trials
            if name in t.params and t.value is not None
        ]

    # --- optimize ---
    def optimize(self, objective: Callable[[Trial], float], n_trials: int,
                 n_jobs: int = 1, callbacks: Optional[List[Callable]] = None):
        callbacks = callbacks or []

        def run_one():
            with self._lock:
                number = len(self.trials)
                trial = Trial(self, number)
                self.trials.append(trial)
            value = objective(trial)
            trial.value = float(value)
            trial.datetime_complete = datetime.datetime.now()
            with self._lock:
                self._persist(trial)
            for cb in callbacks:
                cb(self, trial)

        if n_jobs <= 1:
            for _ in range(n_trials):
                run_one()
        else:
            # thread-parallel trials (one device per trial, reference pattern)
            sem = threading.Semaphore(n_jobs)
            threads = []

            def worker():
                with sem:
                    run_one()

            for _ in range(n_trials):
                th = threading.Thread(target=worker)
                th.start()
                threads.append(th)
            for th in threads:
                th.join()

    # --- results ---
    @property
    def best_trial(self) -> Trial:
        done = [t for t in self.trials if t.value is not None]
        if not done:
            raise ValueError("no completed trials")
        key = (lambda t: t.value) if self.direction == "minimize" else (lambda t: -t.value)
        return min(done, key=key)

    @property
    def best_params(self):
        return self.best_trial.params


def create_study(study_name: str = "study", storage: Optional[str] = None,
                 load_if_exists: bool = True, direction: str = "minimize",
                 sampler: Optional[TPESampler] = None) -> Study:
    if storage and not load_if_exists and storage.startswith("sqlite:///"):
        path = storage[len("sqlite:///"):]
        if os.path.exists(path):
            os.remove(path)
    return Study(study_name, storage, direction, sampler)

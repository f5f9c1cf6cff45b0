"""Fit the extraction-confidence weights to the REFERENCE's own golden
confidence values (SURVEY.md M6 fidelity; round-2 verdict item 5).

The golden fixture instances carry confidences produced by the actual
ReVerbOpenNlpConfFunction, so they ARE a supervision signal for the
public feature families (Fader et al. 2011 §4).  This script builds
the feature matrix over every clean golden instance, ridge-solves the
logit least-squares problem, reports held-out MSE + Spearman vs both
the fitted and the legacy hand-tuned scorer, and writes
``functions/data/conf_weights.json``.

Usage: python scripts/fit_confidence.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RIDGE_LAMBDA = 1.0


def main() -> int:
    from openie_backend_ray.fixtures.conformance import clean_groups
    from openie_backend_ray.functions import confidence as C

    X, y = [], []
    for g in clean_groups():
        for i in g.instances:
            X.append(C.features(i.tokens, i.postags, i.arg1, i.rel, i.arg2))
            y.append(i.confidence)
    X = np.array(X)
    y = np.array(y)
    print(f"{len(y)} golden instances, {X.shape[1]} features")

    eps = 1e-3
    yc = np.clip(y, eps, 1 - eps)
    z = np.log(yc / (1 - yc))

    def spearman(a, b):
        ra = np.argsort(np.argsort(a))
        rb = np.argsort(np.argsort(b))
        return float(np.corrcoef(ra, rb)[0, 1])

    # held-out diagnostic
    rng = np.random.RandomState(5)
    idx = rng.permutation(len(y))
    cut = int(0.8 * len(y))
    tr, te = idx[:cut], idx[cut:]
    A = X[tr].T @ X[tr] + RIDGE_LAMBDA * np.eye(X.shape[1])
    w = np.linalg.solve(A, X[tr].T @ z[tr])
    pred = 1.0 / (1.0 + np.exp(-X[te] @ w))
    print(f"held-out fitted:     MSE {np.mean((pred - y[te])**2):.4f}  "
          f"spearman {spearman(pred, y[te]):.3f}")
    legacy = np.array([
        C.score_rules(i.tokens, i.postags, i.arg1, i.rel, i.arg2)
        for g in clean_groups() for i in g.instances
    ])
    print(f"legacy hand-tuned:   MSE {np.mean((legacy - y)**2):.4f}  "
          f"spearman {spearman(legacy, y):.3f}")

    # shipped weights: full-data fit
    A = X.T @ X + RIDGE_LAMBDA * np.eye(X.shape[1])
    w = np.linalg.solve(A, X.T @ z)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "openie_backend_ray", "functions", "data", "conf_weights.json",
    )
    with open(out, "w", encoding="utf-8") as f:
        json.dump(
            {"version": C.FEATURE_VERSION, "ridge_lambda": RIDGE_LAMBDA,
             "weights": [round(float(x), 6) for x in w]},
            f,
        )
    full = 1.0 / (1.0 + np.exp(-X @ w))
    print(f"full-data fitted:    MSE {np.mean((full - y)**2):.4f}  "
          f"spearman {spearman(full, y):.3f}")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

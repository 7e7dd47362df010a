"""Model-based quality scoring: a logistic-regression quality
classifier trained DISTRIBUTED over the corpus — the Dolma/FineWeb-edu
workflow of distilling an expensive quality judgment into a fast
surface-feature model, here with a deterministic weak-label rule (a
length band) standing in for the expensive judge so training is
reproducible and unit-checkable end to end.

Scale shape: features (a handful of floats per doc, from
textstats.quality_features) are computed once in one streaming pass
and materialized — per-doc payload is ~5 floats, so the materialized
set is orders of magnitude smaller than the corpus text and spills
cleanly if needed.  Each full-batch gradient-descent iteration is one
map over those feature blocks emitting a FEATURE-DIMENSION-sized
gradient partial per batch (numpy matvec inside the batch); the driver
sums partials (d+1 floats per batch row), updates the weights, and
re-broadcasts them via ``ray.put``.  Nothing corpus-sized ever reaches
the driver, and the per-iteration shuffle volume is zero.  Scoring is
one more streaming map with the final weights broadcast once.

The sigmoid makes exact SQL mirroring pointless (libm exp differs
across engines), so the driver entry is rows-only; correctness is
gated by units instead: the trained model must recover the weak-label
rule (accuracy >= 0.97 on the corpus), training must be
deterministic, and a planted linearly-separable set must be fit
exactly.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

_FEATS = ["f_logchar", "f_logtok", "f_stop", "f_digit", "f_meanlen"]


def _feature_table(sf_dir: str):
    """(doc_id, label, f_*) — one streaming pass.  Features are the
    quality_features surface stats on stable scales (log1p token count
    keeps the length feature O(1), ratios are already [0,1]); the weak
    label is the deterministic length-band rule being distilled."""
    import ray.data

    from search_engine_ray.ops.textstats import quality_features

    def feats(batch: pa.Table) -> pa.Table:
        q = quality_features(batch)
        n_tok = q.column("n_tokens").to_numpy().astype(np.float64)
        n_chars = batch.column("n_chars").to_numpy()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "label": pa.array((n_chars >= 150).astype(np.int64),
                              pa.int64()),
            "f_logchar": pa.array(np.log1p(n_chars.astype(np.float64)),
                                  pa.float64()),
            "f_logtok": pa.array(np.log1p(n_tok), pa.float64()),
            "f_stop": q.column("stopword_ratio"),
            "f_digit": q.column("digit_token_ratio"),
            "f_meanlen": q.column("mean_token_len"),
        })

    return (ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "n_chars"])
        .map_batches(feats, batch_format="pyarrow"))


def _xy_of(batch: pa.Table):
    x = np.column_stack(
        [np.ones(batch.num_rows)]
        + [batch.column(f).to_numpy() for f in _FEATS])
    y = batch.column("label").to_numpy().astype(np.float64)
    return x, y


def lr_train_weights(feats_ds, iters: int = 8,
                     l2: float = 1e-4) -> np.ndarray:
    """Newton-Raphson (IRLS) logistic regression over a feature
    Dataset — quadratic convergence, so a handful of distributed
    passes suffice where plain GD on unstandardized features needs
    thousands.  Each pass emits ONE (d + d^2)-float partial per batch
    (gradient + Hessian moments, the PCA op's moment-partials shape);
    the driver solves the d x d system and re-broadcasts w.  The small
    L2 ridge keeps the Hessian invertible on separable data (where the
    unpenalized MLE diverges)."""
    import ray

    feats_ds = feats_ds.materialize()
    d = len(_FEATS) + 1
    w = np.zeros(d)
    for _ in range(iters):
        w_ref = ray.put(w)

        def newton_part(batch: pa.Table, _w=w_ref) -> pa.Table:
            x, y = _xy_of(batch)
            p = 1.0 / (1.0 + np.exp(-(x @ ray.get(_w))))
            g = x.T @ (p - y)
            h = (x * (p * (1.0 - p))[:, None]).T @ x
            cols = {f"g{j}": pa.array([g[j]], pa.float64())
                    for j in range(d)}
            cols.update({f"h{j}_{k}": pa.array([h[j, k]], pa.float64())
                         for j in range(d) for k in range(d)})
            return pa.table(cols)

        parts = (feats_ds.map_batches(newton_part,
                                      batch_format="pyarrow")
                 .to_pandas())
        if parts.empty:
            return w
        # fsum: correctly-rounded float sums, so the trained weights
        # are identical no matter what order blocks arrive in
        from math import fsum

        g = np.array([fsum(parts[f"g{j}"]) for j in range(d)])
        h = np.array([[fsum(parts[f"h{j}_{k}"]) for k in range(d)]
                      for j in range(d)])
        h += l2 * np.eye(d)
        w = w - np.linalg.solve(h, g + l2 * w)
    return w


def quality_lr_scores(sf_dir: str, iters: int = 8):
    """(doc_id, label, score_pct): train the quality classifier on the
    corpus, then score every doc with the broadcast weights in one
    streaming map.  score_pct is the sigmoid probability in integer
    percent (stable across float jitter for row-level gates)."""
    import ray

    # materialize HERE so the scoring pass reuses the same feature
    # blocks the training passes read — otherwise lr_train_weights'
    # internal materialize is local to it and scoring would re-read
    # and re-featurize the whole corpus once more
    feats = _feature_table(sf_dir).materialize()
    w = lr_train_weights(feats, iters=iters)
    w_ref = ray.put(w)

    def score(batch: pa.Table) -> pa.Table:
        x, _ = _xy_of(batch)
        p = 1.0 / (1.0 + np.exp(-(x @ ray.get(w_ref))))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "label": batch.column("label"),
            "score_pct": pa.array(
                np.floor(p * 100.0).astype(np.int64), pa.int64()),
        })

    return feats.map_batches(score, batch_format="pyarrow")

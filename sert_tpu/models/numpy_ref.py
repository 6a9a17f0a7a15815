"""Pure-numpy twin implementations of both model losses.

These are the parity oracles SURVEY.md section 5 (test item 1) calls for:
independent forward implementations against which the JAX losses are checked
exactly, and whose finite differences validate jax.grad. Deliberately written
in plain loops/numpy ops, structured differently from the JAX code, so a bug
must be made twice to slip through.
"""

from __future__ import annotations

import numpy as np


def _pooled(word_emb: np.ndarray, windows: np.ndarray,
            lengths: np.ndarray) -> np.ndarray:
    B, w = windows.shape
    out = np.zeros((B, word_emb.shape[1]), np.float64)
    for i in range(B):
        n = int(lengths[i])
        if n > 0:
            out[i] = word_emb[windows[i, :n]].astype(np.float64).mean(axis=0)
    return out


def loglinear_loss(params, windows, lengths, entities) -> float:
    we = np.asarray(params["word_emb"], np.float64)
    W = np.asarray(params["proj_w"], np.float64)
    b = np.asarray(params["proj_b"], np.float64)
    pooled = _pooled(we, windows, lengths)
    z = pooled @ W + b                                    # [B, E]
    z_max = z.max(axis=1, keepdims=True)
    lse = z_max[:, 0] + np.log(np.exp(z - z_max).sum(axis=1))
    gold = z[np.arange(z.shape[0]), entities]
    return float(np.mean(lse - gold))


def _log_sigmoid(x: np.ndarray) -> np.ndarray:
    # stable: -log(1 + exp(-x)) = min(x,0) - log1p(exp(-|x|))
    return np.minimum(x, 0.0) - np.log1p(np.exp(-np.abs(x)))


def lse_nce_loss(params, windows, lengths, entities, negatives) -> float:
    we = np.asarray(params["word_emb"], np.float64)
    W = np.asarray(params["proj_w"], np.float64)
    b = np.asarray(params["proj_b"], np.float64)
    ent = np.asarray(params["entity_emb"], np.float64)
    reps = np.tanh(_pooled(we, windows, lengths) @ W + b)  # [B, de]
    B, k = negatives.shape
    total = 0.0
    for i in range(B):
        s_pos = float(reps[i] @ ent[entities[i]])
        total += float(_log_sigmoid(np.array(s_pos)))
        for j in range(k):
            s_neg = float(reps[i] @ ent[negatives[i, j]])
            total += float(_log_sigmoid(np.array(-s_neg)))
    return -total / B


def lse_sampled_softmax_loss(params, windows, lengths, entities,
                             negatives, logq) -> float:
    """Twin of models.lse.loss_sampled_softmax: batch-SHARED negatives
    ``[k]``, sampled columns corrected by -log(k * q(candidate)) (the
    positive column uncorrected), accidental-hit masking, softmax CE with
    the positive in column 0."""
    we = np.asarray(params["word_emb"], np.float64)
    W = np.asarray(params["proj_w"], np.float64)
    b = np.asarray(params["proj_b"], np.float64)
    ent = np.asarray(params["entity_emb"], np.float64)
    logq = np.asarray(logq, np.float64)
    reps = np.tanh(_pooled(we, windows, lengths) @ W + b)   # [B, de]
    B = reps.shape[0]
    k = len(negatives)
    total = 0.0
    for i in range(B):
        row = [float(reps[i] @ ent[entities[i]])]
        for j in negatives:
            if int(j) == int(entities[i]):
                row.append(-1e30)
            else:
                row.append(float(reps[i] @ ent[int(j)])
                           - float(logq[int(j)]) - np.log(k))
        row = np.asarray(row)
        m = row.max()
        lse = m + np.log(np.exp(row - m).sum())
        total += lse - row[0]
    return total / B


def lse_full_softmax_loss(params, windows, lengths, entities) -> float:
    we = np.asarray(params["word_emb"], np.float64)
    W = np.asarray(params["proj_w"], np.float64)
    b = np.asarray(params["proj_b"], np.float64)
    ent = np.asarray(params["entity_emb"], np.float64)
    reps = np.tanh(_pooled(we, windows, lengths) @ W + b)
    z = reps @ ent.T
    z_max = z.max(axis=1, keepdims=True)
    lse = z_max[:, 0] + np.log(np.exp(z - z_max).sum(axis=1))
    gold = z[np.arange(z.shape[0]), entities]
    return float(np.mean(lse - gold))


def loglinear_query_scores(params, term_ids) -> np.ndarray:
    """[E] sum over terms of log softmax(W^T e_t + b) — the WWW 2016
    term-independence aggregation, computed independently of JAX."""
    we = np.asarray(params["word_emb"], np.float64)
    W = np.asarray(params["proj_w"], np.float64)
    b = np.asarray(params["proj_b"], np.float64)
    scores = np.zeros(W.shape[1], np.float64)
    for t in term_ids:
        z = we[t] @ W + b
        z = z - z.max()
        scores += z - np.log(np.exp(z).sum())
    return scores

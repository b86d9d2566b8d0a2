"""Merging t-digest (Dunning's algorithm, folly-style k1 scale) for
approx_percentile_cont with an explicit ``num_centroids``.

DataFusion's t-digest aggregate follows the folly TDigest formulation:
values merge left-to-right into centroids bounded by the k1 scale
function's quantile limits, and quantile estimation interpolates
between neighboring centroid means. With the digest size made explicit
the approximation SHAPE is observable (its tests pin interpolated
values like 4.75 for [4, 4, 6] at size 2), so the same algorithm runs
here — derived from the published t-digest algorithm, validated against
the reference's pinned expectations.
"""

from __future__ import annotations


def _k_to_q(k: float, d: float) -> float:
    t = k / d
    if t >= 0.5:
        base = 1.0 - t
        return 1.0 - 2.0 * base * base
    return 2.0 * t * t


def _compress(sorted_vals: list[float], max_size: int) -> list[tuple[float, float]]:
    """[(mean, weight)] centroids via the merging rule: a centroid keeps
    absorbing while cumulative weight stays within the k1 quantile
    limit."""
    n = float(len(sorted_vals))
    out: list[tuple[float, float]] = []
    k = 1
    q_limit = _k_to_q(k, max_size) * n
    w_so_far = 0.0
    cur_sum, cur_w = sorted_vals[0], 1.0
    for v in sorted_vals[1:]:
        if w_so_far + cur_w + 1.0 <= q_limit:
            cur_sum += v
            cur_w += 1.0
        else:
            w_so_far += cur_w
            out.append((cur_sum / cur_w, cur_w))
            k += 1
            q_limit = _k_to_q(k, max_size) * n
            cur_sum, cur_w = v, 1.0
    out.append((cur_sum / cur_w, cur_w))
    return out


def tdigest_quantile(values, q: float, max_size: int) -> float | None:
    vals = sorted(float(v) for v in values)
    n = len(vals)
    if n == 0:
        return None
    if n == 1:
        return vals[0]
    cents = _compress(vals, max_size)
    if len(cents) == 1:
        return cents[0][0]
    rank = q * n
    # locate the centroid whose weight span covers the rank
    t = 0.0
    pos = len(cents) - 1
    for i, (_, w) in enumerate(cents):
        if t + w > rank:
            pos = i
            break
        t += w
    mean, w = cents[pos]
    if pos == 0:
        delta = cents[1][0] - cents[0][0]
    elif pos == len(cents) - 1:
        delta = cents[pos][0] - cents[pos - 1][0]
    else:
        delta = (cents[pos + 1][0] - cents[pos - 1][0]) / 2.0
    value = mean + ((rank - t) / w - 0.5) * delta
    return min(max(value, vals[0]), vals[-1])

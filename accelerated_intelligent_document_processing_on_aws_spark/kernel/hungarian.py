"""Optimal bipartite assignment (Hungarian / Jonker-Volgenant style).

Pure-Python O(n^3) shortest-augmenting-path implementation of the
classic algorithm (Kuhn 1955; Jonker & Volgenant 1987 — public
literature), used by the Hungarian list comparator
(reference: munkres over a cost matrix,
``lib/idp_common_pkg/idp_common/evaluation/comparator.py:240-303``).
Prefers ``scipy.optimize.linear_sum_assignment`` when available.
"""

from __future__ import annotations

try:  # pragma: no cover - scipy absent in this sandbox
    from scipy.optimize import linear_sum_assignment as _lsa

    def assign(cost: list[list[float]]) -> list[tuple[int, int]]:
        rows, cols = _lsa(cost)
        return list(zip(rows.tolist(), cols.tolist()))

except ImportError:

    def assign(cost: list[list[float]]) -> list[tuple[int, int]]:
        """Min-cost assignment over an n×m cost matrix.

        Returns row→col pairs covering min(n, m) rows.  Shortest
        augmenting path with dual potentials (the standard JV
        formulation on a rectangular matrix padded implicitly).
        """
        n = len(cost)
        if n == 0:
            return []
        m = len(cost[0])
        transposed = n > m
        if transposed:
            cost = [[cost[i][j] for i in range(n)] for j in range(m)]
            n, m = m, n
        INF = float("inf")
        # potentials and matching; 1-indexed internally (col 0 = virtual)
        u = [0.0] * (n + 1)
        v = [0.0] * (m + 1)
        p = [0] * (m + 1)  # p[j] = row matched to col j
        way = [0] * (m + 1)
        for i in range(1, n + 1):
            p[0] = i
            j0 = 0
            minv = [INF] * (m + 1)
            used = [False] * (m + 1)
            while True:
                used[j0] = True
                i0 = p[j0]
                delta = INF
                j1 = 0
                for j in range(1, m + 1):
                    if used[j]:
                        continue
                    cur = cost[i0 - 1][j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j] = cur
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
                for j in range(m + 1):
                    if used[j]:
                        u[p[j]] += delta
                        v[j] -= delta
                    else:
                        minv[j] -= delta
                j0 = j1
                if p[j0] == 0:
                    break
            while j0:
                j1 = way[j0]
                p[j0] = p[j1]
                j0 = j1
        pairs = [(p[j] - 1, j - 1) for j in range(1, m + 1) if p[j] != 0]
        if transposed:
            pairs = [(c, r) for r, c in pairs]
        return sorted(pairs)

"""Overlap alignment in minimizer space (trim oracle).

Mirrors MinimizerAligner (src/readSelection/MinimizerAligner.hpp:14-408):
a dense overlap DP with match=3, mismatch=-1, gap=-1, free leading gaps,
max over last row / last column (the column scan runs second and wins ties),
and diag > up > left backtrack preference.

The row recurrences are vectorized; the left-gap running max uses the
affine identity  M'[j] = g*j + cummax(M[j] - g*j)  (exact in int32).
"""

import numpy as np

MATCH = 3
MISMATCH = -1
GAP = -1


def perform_alignment(ref_mins, query_mins):
    """Returns list of (ref_idx|-1, query_idx|-1) pairs, leading gaps trimmed
    (the OV backtrack stops at i==0 or j==0)."""
    R = len(ref_mins)
    Q = len(query_mins)
    if R == 0 or Q == 0:
        return []

    ref = np.asarray(ref_mins, np.uint32)
    query = np.asarray(query_mins, np.uint32)
    profile = np.where(query[None, :] == ref[:, None],
                       np.int32(MATCH), np.int32(MISMATCH))  # (R, Q)

    M = np.zeros((R + 1, Q + 1), np.int32)
    j_idx = np.arange(Q + 1, dtype=np.int32)
    gj = np.int32(GAP) * j_idx
    for i in range(1, R + 1):
        prev = M[i - 1]
        row = np.empty(Q + 1, np.int32)
        row[0] = 0
        np.maximum(prev[:-1] + profile[i - 1], prev[1:] + np.int32(GAP),
                   out=row[1:])
        # row[j] = max(row[j], row[j-1] + GAP) as a running max
        c = row - gj
        np.maximum.accumulate(c, out=c)
        M[i] = c + gj

    # explicit max scans (MinimizerAligner.hpp:250-289): last row keeps the
    # largest j on ties, then last column keeps the largest i on ties
    max_i, max_j = 0, 0
    max_score = np.iinfo(np.int64).min
    last_row = M[R]
    for j in range(1, Q + 1):
        if int(last_row[j]) >= max_score:
            max_score = int(last_row[j])
            max_i, max_j = R, j
    last_col = M[1:, Q]
    for i in range(1, R + 1):
        if int(last_col[i - 1]) >= max_score:
            max_score = int(last_col[i - 1])
            max_i, max_j = i, Q

    if max_i == 0 and max_j == 0:
        return []

    alignment = []
    i, j = max_i, max_j
    while i != 0 and j != 0:
        h = int(M[i, j])
        prev_i = prev_j = None
        if h == int(M[i - 1, j - 1]) + int(profile[i - 1, j - 1]):
            prev_i, prev_j = i - 1, j - 1
        elif h == int(M[i - 1, j]) + GAP:
            prev_i, prev_j = i - 1, j
        elif h == int(M[i, j - 1]) + GAP:
            prev_i, prev_j = i, j - 1
        else:  # unreachable by construction
            prev_i, prev_j = i - 1, j - 1
        alignment.append((-1 if i == prev_i else i - 1,
                          -1 if j == prev_j else j - 1))
        i, j = prev_i, prev_j

    alignment.reverse()
    return alignment

"""Alignment traceback for top-k hits.

The reference deliberately dropped traceback from its engine (score-only;
Final Report §"Our Scope and Assumptions" — SURVEY.md §0), but the BASELINE
north star restores it for the best hits: after the scan identifies top-k
database sequences, each is re-aligned *once* with a full traceback matrix.
This two-phase design keeps the hot scan linear-space while making alignment
output O(k) instead of O(N).

The DP here follows the exact same folded Gotoh recurrence as the engines
(:mod:`.oracle`), so the traceback score always equals the scan score —
asserted by tests. Output is the pair of gapped strings plus a CIGAR.

Memory: O(Lq * Lb) bytes (one uint8 state per cell per matrix). For
pathological pairs beyond ``MAX_CELLS`` the caller should band or chunk; the
top-k use case (protein vs protein) is far below the limit.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

MAX_CELLS = 1 << 30  # 1G cells * 3 bytes ~ 3 GB hard cap


@dataclass
class Alignment:
    """One local alignment: score, coordinates, gapped strings, CIGAR."""

    score: int
    query_start: int  # 0-based inclusive
    query_end: int  # 0-based exclusive
    db_start: int
    db_end: int
    query_aligned: str
    db_aligned: str
    cigar: str  # M/I/D run-length ops (I = gap in db, consumes query)


def sw_traceback(
    query_idx: np.ndarray,
    db_idx: np.ndarray,
    table: np.ndarray,
    gap_open: int,
    gap_extend: int,
    query_str: str | None = None,
    db_str: str | None = None,
) -> Alignment:
    """Full-matrix Smith-Waterman with affine gaps and traceback.

    Recurrence identical to the engines' (reference ``src/alignment.c:122-161``):
    H folds E/F at the diagonal; all matrices floored at zero.
    """
    from ..models.alphabet import decode

    go = int(gap_open) + int(gap_extend)
    ge = int(gap_extend)
    lq, lb = len(query_idx), len(db_idx)
    if (lq + 1) * (lb + 1) > MAX_CELLS:
        raise MemoryError(
            f"traceback matrix {lq+1}x{lb+1} exceeds MAX_CELLS; band or chunk"
        )
    q = np.asarray(query_idx, dtype=np.int64)
    d = np.asarray(db_idx, dtype=np.int64)
    if query_str is None:
        query_str = decode(q)
    if db_str is None:
        db_str = decode(d)

    H = np.zeros((lb + 1, lq + 1), dtype=np.int64)
    E = np.zeros((lb + 1, lq + 1), dtype=np.int64)
    F = np.zeros((lb + 1, lq + 1), dtype=np.int64)
    # Traceback states: which predecessor matrix fed each cell.
    # 0 = none (terminates at zero floor), 1 = H, 2 = E, 3 = F.
    tb_h = np.zeros((lb + 1, lq + 1), dtype=np.uint8)
    tb_e = np.zeros((lb + 1, lq + 1), dtype=np.uint8)
    tb_f = np.zeros((lb + 1, lq + 1), dtype=np.uint8)

    # Vectorized row sweep over i (the E/H updates depend only on row j-1;
    # F needs a sequential pass along i, done with a running scan).
    best, best_pos = 0, (0, 0)
    for j in range(1, lb + 1):
        srow = table[q, d[j - 1]]  # (lq,)
        hprev, eprev, fprev = H[j - 1], E[j - 1], F[j - 1]

        # H candidates from the diagonal of row j-1.
        diag_h, diag_e, diag_f = hprev[:-1], eprev[:-1], fprev[:-1]
        # max3 with priority H > E > F (matches MAX4 macro order semantics:
        # ties resolved toward H; tie order does not affect scores).
        m_he = np.where(diag_e > diag_h, diag_e, diag_h)
        src_he = np.where(diag_e > diag_h, 2, 1).astype(np.uint8)
        m3 = np.where(diag_f > m_he, diag_f, m_he)
        src3 = np.where(diag_f > m_he, 3, src_he).astype(np.uint8)
        h_val = m3 + srow
        h_src = src3.copy()
        zero_mask = h_val < 0
        h_val = np.where(zero_mask, 0, h_val)
        h_src = np.where(zero_mask, 0, h_src).astype(np.uint8)
        H[j, 1:] = h_val
        tb_h[j, 1:] = h_src

        # E from row j-1 (vertical gap).
        e_h = hprev[1:] + go
        e_e = eprev[1:] + ge
        e_f = fprev[1:] + go
        m_he_e = np.where(e_e > e_h, e_e, e_h)
        src_he_e = np.where(e_e > e_h, 2, 1).astype(np.uint8)
        e_val = np.where(e_f > m_he_e, e_f, m_he_e)
        e_src = np.where(e_f > m_he_e, 3, src_he_e).astype(np.uint8)
        ez = e_val < 0
        E[j, 1:] = np.where(ez, 0, e_val)
        tb_e[j, 1:] = np.where(ez, 0, e_src)

        # F along the row (horizontal gap): sequential in i.
        hrow, erow = H[j], E[j]
        frow = F[j]
        tfrow = tb_f[j]
        for i in range(1, lq + 1):
            fh = hrow[i - 1] + go
            fe = erow[i - 1] + go
            ff = frow[i - 1] + ge
            if fe > fh:
                v, s = fe, 2
            else:
                v, s = fh, 1
            if ff > v:
                v, s = ff, 3
            if v < 0:
                v, s = 0, 0
            frow[i] = v
            tfrow[i] = s

        jmax = int(H[j].argmax())
        if H[j, jmax] > best:
            best = int(H[j, jmax])
            best_pos = (j, jmax)

    # Walk back from the best H cell.
    j, i = best_pos
    mat = 1  # start in H
    qa, da, ops = [], [], []
    while j > 0 and i > 0:
        if mat == 1:  # H cell: came from diagonal (or terminates)
            src = tb_h[j, i]
            if H[j, i] == 0 and src == 0:
                break
            qa.append(query_str[i - 1])
            da.append(db_str[j - 1])
            ops.append("M")
            i -= 1
            j -= 1
            if src == 0:
                break
            mat = src
        elif mat == 2:  # E cell: gap in query dimension... consumes db char
            src = tb_e[j, i]
            qa.append("-")
            da.append(db_str[j - 1])
            ops.append("D")
            j -= 1
            if src == 0:
                break
            mat = src
        else:  # F cell: gap in db, consumes query char
            src = tb_f[j, i]
            qa.append(query_str[i - 1])
            da.append("-")
            ops.append("I")
            i -= 1
            if src == 0:
                break
            mat = src

    qa.reverse()
    da.reverse()
    ops.reverse()
    # Run-length encode the CIGAR.
    cigar = []
    k = 0
    while k < len(ops):
        r = k
        while r < len(ops) and ops[r] == ops[k]:
            r += 1
        cigar.append(f"{r-k}{ops[k]}")
        k = r
    return Alignment(
        score=best,
        query_start=i,
        query_end=best_pos[1],
        db_start=j,
        db_end=best_pos[0],
        query_aligned="".join(qa),
        db_aligned="".join(da),
        cigar="".join(cigar),
    )


def align_pair(
    seq_a: str,
    seq_b: str,
    scoring,
) -> Alignment:
    """Align two sequences directly (the upstream seq-align use case the
    reference specialized away). Convenience wrapper over sw_traceback."""
    qa = scoring.query_indices(seq_a)
    from ..models.alphabet import encode

    return sw_traceback(
        qa,
        encode(seq_b),
        scoring.table,
        scoring.gap_open,
        scoring.gap_extend,
        query_str=seq_a,
        db_str=seq_b,
    )


def topk_alignments(
    query_idx: np.ndarray,
    db,
    scores: np.ndarray,
    k: int,
    table: np.ndarray,
    gap_open: int,
    gap_extend: int,
    query_str: str | None = None,
) -> list[tuple[int, Alignment]]:
    """Re-align the k best-scoring database records with traceback.

    ``db`` is an EncodedDatabase (or anything with ``record(i)``); returns
    [(record_id, Alignment)] sorted by descending score (stable).
    """
    order = np.argsort(-np.asarray(scores), kind="stable")[:k]
    out = []
    for rec in order:
        aln = sw_traceback(
            query_idx,
            db.record(int(rec)),
            table,
            gap_open,
            gap_extend,
            query_str=query_str,
        )
        out.append((int(rec), aln))
    return out

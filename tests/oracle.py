"""Independent NumPy oracles of the reference algorithm semantics, written
directly from the behavioral spec in SURVEY.md §3 (serial elas.cpp).  Used
only by tests; deliberately loop-based and obvious."""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# Support matching (computeMatchingDisparity, elas.cpp:266-371)

def match_disparity(dL, dR, u, v, right, p, W, H):
    if not (5 <= u <= W - 6 and 5 <= v <= H - 6):
        return -1
    D1, D2 = (dL, dR) if not right else (dR, dL)
    center = D1[:, v, u].astype(np.int32)
    if np.abs(center - 128).sum() < p.support_texture:
        return -1
    dmaxv = min(p.disp_max, (u - 5) if not right else (W - u - 5))
    if dmaxv - max(p.disp_min, 0) < 10:
        return -1
    offs = [(-2, -2), (2, -2), (-2, 2), (2, 2)]
    A = np.concatenate([D1[:, v + ov, u + ou] for ou, ov in offs]).astype(np.int32)
    e1 = e2 = 32767
    d1 = d2 = -1
    for d in range(max(p.disp_min, 0), dmaxv + 1):
        uw = u - d if not right else u + d
        B = np.concatenate([D2[:, v + ov, uw + ou]
                            for ou, ov in offs]).astype(np.int32)
        s = int(np.abs(A - B).sum())
        if s < e1:
            e2, d2, e1, d1 = e1, d1, s, d
        elif s < e2:
            e2, d2 = s, d
    if d1 >= 0 and d2 >= 0 and float(e1) < p.support_threshold * float(e2):
        return d1
    return -1


def support_grid(dL, dR, p, W, H):
    """Raw candidate grid (computeSupportMatches before filters)."""
    step = p.step
    Hc, Wc = -(-H // step), -(-W // step)
    out = np.full((Hc, Wc), -1, np.int16)
    for uc in range(1, Wc):
        for vc in range(1, Hc):
            u, v = uc * step, vc * step
            d = match_disparity(dL, dR, u, v, False, p, W, H)
            if d >= 0:
                d2 = match_disparity(dL, dR, u - d, v, True, p, W, H)
                if d2 >= 0 and abs(d - d2) <= p.lr_threshold:
                    out[vc, uc] = d
    return out


# ---------------------------------------------------------------------------
# Dense matching (findMatch, elas.cpp:688-801), given per-pixel plane/grid

def find_match(u, v, plane, valid_plane, grid_list, dL, dR, P, radius, right,
               p, W, H, sub):
    """Returns matched disparity or None (pixel untouched) or -1."""
    window = 2
    if u < window or u >= W - window:
        return None
    vr = max(min(v, H - 3), 2)
    D1, D2 = (dL, dR) if not right else (dR, dL)
    A = D1[:, vr, u].astype(np.int32)
    if np.abs(A - 128).sum() < p.match_texture:
        return None
    a, b, c = plane
    d_plane = int(np.float32(a) * np.float32(u) + np.float32(b) * np.float32(v)
                  + np.float32(c))
    disp_num = p.disp_num
    lo, hi = max(d_plane - radius, 0), min(d_plane + radius, disp_num - 1)
    best_val, best_d = 10000, -1
    for d in grid_list:
        if lo <= d <= hi:
            continue
        uw = u - d if not right else u + d
        if uw < window or uw >= W - window:
            continue
        val = int(np.abs(A - D2[:, vr, uw].astype(np.int32)).sum())
        if val < best_val:
            best_val, best_d = val, d
    for d in range(lo, hi + 1):
        uw = u - d if not right else u + d
        if uw < window or uw >= W - window:
            continue
        w = int(P[abs(d - d_plane)]) if valid_plane else 0
        val = int(np.abs(A - D2[:, vr, uw].astype(np.int32)).sum()) + w
        if val < best_val:
            best_val, best_d = val, d
    return best_d if best_d >= 0 else -1


# ---------------------------------------------------------------------------
# Post-processing oracles

def lr_check(D1, D2, p):
    H, W = D1.shape
    o1, o2 = D1.copy(), D2.copy()
    for v in range(H):
        for u in range(W):
            d1, d2 = D1[v, u], D2[v, u]
            f = 0.5 if p.subsampling else 1.0
            uw1, uw2 = u - d1 * f, u + d2 * f
            if d1 >= 0 and 0 <= uw1 < W:
                if abs(D2[v, int(uw1)] - d1) > p.lr_threshold:
                    o1[v, u] = -10
            else:
                o1[v, u] = -10
            if d2 >= 0 and 0 <= uw2 < W:
                if abs(D1[v, int(uw2)] - d2) > p.lr_threshold:
                    o2[v, u] = -10
            else:
                o2[v, u] = -10
    return o1, o2


def remove_small_segments(D, p):
    import collections
    H, W = D.shape
    out = D.copy()
    speckle = p.speckle_size
    if p.subsampling:
        speckle = int(np.sqrt(float(p.speckle_size)) * 2)
    done = np.zeros((H, W), bool)
    for v0 in range(H):
        for u0 in range(W):
            if done[v0, u0]:
                continue
            seg = [(v0, u0)]
            done[v0, u0] = True
            qi = 0
            while qi < len(seg):
                v, u = seg[qi]
                qi += 1
                for dv, du in ((0, -1), (0, 1), (-1, 0), (1, 0)):
                    v2, u2 = v + dv, u + du
                    if not (0 <= v2 < H and 0 <= u2 < W):
                        continue
                    if done[v2, u2] or D[v2, u2] < 0:
                        continue
                    if abs(D[v, u] - D[v2, u2]) <= p.speckle_sim_threshold:
                        seg.append((v2, u2))
                        done[v2, u2] = True
            if len(seg) < speckle:
                for v, u in seg:
                    out[v, u] = -10
    return out


def gap_interpolation(D, p):
    H, W = D.shape
    out = D.copy()
    gap = p.ipol_gap_width
    if p.subsampling:
        gap = p.ipol_gap_width // 2 + 1

    def pass_1d(arr, n):
        count = 0
        for i in range(n):
            if arr[i] >= 0:
                if 1 <= count <= gap:
                    first, last = i - count, i - 1
                    if first > 0 and last < n - 1:
                        d1, d2 = arr[first - 1], arr[last + 1]
                        val = (d1 + d2) / 2 if abs(d1 - d2) < 3.0 else min(d1, d2)
                        arr[first:last + 1] = val
                count = 0
            else:
                count += 1
        if p.add_corners:
            for i in range(n):
                if arr[i] >= 0:
                    arr[max(i - gap, 0):i] = arr[i]
                    break
            for i in range(n - 1, -1, -1):
                if arr[i] >= 0:
                    arr[i:min(i + gap, n - 1) + 1] = arr[i]
                    break

    for v in range(H):
        pass_1d(out[v, :], W)
    for u in range(W):
        col = out[:, u].copy()
        pass_1d(col, H)
        out[:, u] = col
    return out


def adaptive_mean(D, p):
    H, W = D.shape
    Dc = D.copy()
    Dc[D < 0] = -10
    tmp = Dc.copy()
    out = D.copy()
    offs = range(-2, 2) if p.subsampling else range(-4, 4)
    c0 = 2 if p.subsampling else 4
    for v in range(3, H - 3):
        for u in range(c0, (W - 1) if p.subsampling else (W - 3)):
            vals = np.array([Dc[v, u + j] for j in offs], np.float32)
            w = np.maximum(0, 4 - np.abs(vals - Dc[v, u]))
            if w.sum() > 0:
                d = float((vals * w).sum() / w.sum())
                if d >= 0:
                    tmp[v, u] = d
    for u in range(3, W - 3):
        for v in range(c0, (H - 1) if p.subsampling else (H - 3)):
            vals = np.array([tmp[v + j, u] for j in offs], np.float32)
            w = np.maximum(0, 4 - np.abs(vals - tmp[v, u]))
            if w.sum() > 0:
                d = float((vals * w).sum() / w.sum())
                if d >= 0:
                    out[v, u] = d
    return out


def median_filter(D, p):
    H, W = D.shape
    tmp = np.zeros((H, W), D.dtype)
    out = D.copy()
    for v in range(3, H - 3):
        for u in range(3, W - 3):
            tmp[v, u] = (np.median(D[v, u - 3:u + 4])
                         if D[v, u] >= 0 else D[v, u])
    for v in range(3, H - 3):
        for u in range(3, W - 3):
            if D[v, u] >= 0:
                out[v, u] = np.median(tmp[v - 3:v + 4, u])
    return out
